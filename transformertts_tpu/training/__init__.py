from transformertts_tpu.training.state import TrainState, make_optimizer
from transformertts_tpu.training.forward_trainer import ForwardTrainer

__all__ = ['TrainState', 'make_optimizer', 'ForwardTrainer']
