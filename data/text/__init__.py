"""Reference-compatible import path: ``from data.text import TextToTokens``."""
from transformertts_tpu.text import TextToTokens, Phonemizer, Tokenizer, all_phonemes

__all__ = ['TextToTokens', 'Phonemizer', 'Tokenizer', 'all_phonemes']
