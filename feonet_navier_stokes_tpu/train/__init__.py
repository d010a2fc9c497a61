"""Training: optax optimizers, fused jitted train step, metrics, checkpoints,
structured logging. Replaces the reference's per-script epoch loops
(FEONet_Stokes_square/train_FEONet.py:374-483 and siblings)."""

from .metrics import rel_l2_error, component_errors, trajectory_rel_l2
from .optimizers import build_optimizer, OPTIMIZERS
from .trainer import TrainConfig, Trainer, TrainState, Dataset

__all__ = [
    "rel_l2_error",
    "component_errors",
    "trajectory_rel_l2",
    "build_optimizer",
    "OPTIMIZERS",
    "TrainConfig",
    "Trainer",
    "TrainState",
    "Dataset",
]
