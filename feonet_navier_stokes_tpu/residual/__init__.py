"""Galerkin residual losses — the label-free training objectives.

Pure functions of (operators, predictions, loads); fused with the model
forward under one jit by the trainer. Replaces the reference's per-DoF Python
loss loops and per-sample matmul list comprehensions (SURVEY.md "warts";
reference: FEONet_Stokes_square/train_FEONet.py:261-301)."""

from .losses import (
    linear_residual,
    nonlinear_defect_residual,
    nonlinear_residual,
    rollout_residual,
    rollout_ns_residual,
    sum_of_squares,
)

__all__ = [
    "linear_residual",
    "nonlinear_defect_residual",
    "nonlinear_residual",
    "rollout_residual",
    "rollout_ns_residual",
    "sum_of_squares",
]
