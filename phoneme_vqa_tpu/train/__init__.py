from .checkpoint import CheckpointManager
from .optim import build_optimizer, cross_entropy_loss
from .state import TrainState

__all__ = ["CheckpointManager", "TrainState", "build_optimizer", "cross_entropy_loss"]
