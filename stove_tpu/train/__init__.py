"""Training stack: trainer, evaluation, checkpointing, metrics, viz."""

from stove_tpu.train.trainer import Trainer, TrainState, make_optimizer  # noqa: F401
from stove_tpu.train import checkpoint, evaluate, metrics  # noqa: F401
