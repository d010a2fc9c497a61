"""Evaluation visualization (L5 parity with the reference notebooks)."""

from .plots import tricontourf_compare, plot_training_history, velocity_magnitude

__all__ = ["tricontourf_compare", "plot_training_history", "velocity_magnitude"]
