"""Model zoo: ForwardTransformer (inference model) and Aligner (teacher)."""
from transformertts_tpu.models.forward_tts import ForwardTransformer

__all__ = ['ForwardTransformer']
