from transformertts_tpu.training.state import TrainState, make_optimizer
from transformertts_tpu.training.forward_trainer import ForwardTrainer
from transformertts_tpu.training.aligner_trainer import AlignerTrainer

__all__ = ['TrainState', 'make_optimizer', 'ForwardTrainer', 'AlignerTrainer']
