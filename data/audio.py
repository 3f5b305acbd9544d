"""Reference-compatible import path: ``from data.audio import Audio``."""
from transformertts_tpu.audio import Audio, Normalizer, MelGAN, WaveRNN

__all__ = ['Audio', 'Normalizer', 'MelGAN', 'WaveRNN']
