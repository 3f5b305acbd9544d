"""Reference-compatible import path: ``from model.models import ForwardTransformer``."""
from transformertts_tpu.models.forward_tts import ForwardTransformer
from transformertts_tpu.models.aligner import Aligner

__all__ = ['ForwardTransformer', 'Aligner']
