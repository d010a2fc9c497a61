"""feonet_navier_stokes_tpu — a TPU-native FEONet framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
repo `haltmayermarc/FEONet_Navier_Stokes` (four PDE workloads: steady Stokes on
the unit square, Stokes around an obstacle with GRF forcing, steady
Navier-Stokes with the nonlinear convection residual, and time-dependent
Stokes with implicit-Euler rollout).

Design principles (TPU-first, not a port):
  * One shared package instead of four copy-pasted problem directories
    (reference layout: FEONet_Stokes_square/, FEONet-square-with-hole/,
    FEONet_steady_Navier-Stokes/, FEONet_time_dep_Stokes/).
  * Canonical block DoF ordering [u1 | u2 | p] — contiguous blocks replace the
    reference's FEniCS permutation reconstruction
    (reference: FEONet_Stokes_square/assemble_fenics.py:74-102).
  * FEM assembly as vmapped element kernels + segment-sum scatter under jit,
    replacing the FEniCS/DOLFIN C++ assembly path.
  * Residual losses as pure fused functions (one einsum + reduction), replacing
    the per-DoF Python loss loop (reference train_FEONet.py:290-296).
  * Batch/data parallelism via jax.sharding.Mesh + jit sharding annotations.
"""

__version__ = "0.1.0"

from . import fem, geometry, linalg, models, parallel, problems, residual, sampling, train
from .problems import Problem, ProblemConfig, build_problem
from .train import Trainer, TrainConfig
