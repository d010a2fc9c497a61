"""Problem registry: one parameterized setup per reference problem directory.

Replaces the reference's four copy-pasted directories
(FEONet_Stokes_square/, FEONet-square-with-hole/,
FEONet_steady_Navier-Stokes/, FEONet_time_dep_Stokes/) with a single
``build_problem(config)`` factory."""

from .base import Problem, ProblemConfig, build_problem, PROBLEM_NAMES

__all__ = ["Problem", "ProblemConfig", "build_problem", "PROBLEM_NAMES"]
