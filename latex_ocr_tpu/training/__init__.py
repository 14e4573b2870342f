from .checkpoint import CheckpointManager
from .trainer import Trainer

__all__ = ["CheckpointManager", "Trainer"]
