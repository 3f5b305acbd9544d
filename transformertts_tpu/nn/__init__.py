"""Functional NN layer zoo (param-pytree modules)."""
from transformertts_tpu.nn import core, blocks, masks, posenc, attention, length_regulator

__all__ = ['core', 'blocks', 'masks', 'posenc', 'attention', 'length_regulator']
