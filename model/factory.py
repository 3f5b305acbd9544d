"""Reference-compatible import path: ``from model.factory import tts_ljspeech``."""
from transformertts_tpu.models.factory import (tts_ljspeech, tts_custom,
                                               aligner_custom, load_model_dir)

__all__ = ['tts_ljspeech', 'tts_custom', 'aligner_custom', 'load_model_dir']
