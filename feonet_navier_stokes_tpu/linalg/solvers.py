"""Ground-truth dense solvers (steady solve + implicit-Euler rollout).

Replaces the reference's per-sample ``np.linalg.solve`` loops:
  * steady:  coeff_u = solve(matrix, load_vector) per sample
    (reference: FEONet_Stokes_square/create_data.py:63-67) — here one
    LU factorization shared across the whole batch.
  * time-dependent: 101-step rollout of
    solve(S + dt*A, S u + dt f) (reference:
    FEONet_time_dep_Stokes/create_data.py:75-91) — one prefactorized LU,
    all trajectories advanced together per step.

Host-side scipy/numpy float64 UNCONDITIONALLY: these produce the reference
solutions (create_data.py replacement) that training metrics compare against;
they must be exact on any JAX backend (TPU f64 LU does not even compile).
See fem/assemble.py's placement rationale.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
from scipy.linalg import lu_factor, lu_solve

Array = np.ndarray


def _factorize(A):
    """LU-factorize dense (scipy.linalg) or sparse (SuperLU) matrices and
    return a solve(batch_of_rhs_rows) closure. Sparse path enables the
    ~50k-DoF stretch configs where dense O(ng^3) LU is infeasible."""
    from scipy.sparse import issparse

    if issparse(A):
        from scipy.sparse.linalg import splu

        lu = splu(A.tocsc().astype(np.float64))
        return lambda rhs_rows: lu.solve(np.asarray(rhs_rows, dtype=np.float64).T).T
    lu, piv = lu_factor(np.asarray(A, dtype=np.float64))
    return lambda rhs_rows: lu_solve((lu, piv), np.asarray(rhs_rows, dtype=np.float64).T).T


def solve_dense(A: Array, b: Array) -> np.ndarray:
    """Single solve A x = b (float64; dense or scipy sparse A)."""
    return _factorize(A)(np.asarray(b, dtype=np.float64)[None])[0]


def solve_dense_batched(A: Array, B: Array) -> np.ndarray:
    """Solve A x_i = b_i for a batch B of shape (n_samples, n).

    One factorization, one triangular-solve batch — the reference's
    O(n^3)-per-sample loop collapses to O(n^3) + O(n_samples n^2).
    Sparse A uses SuperLU (50k-DoF path).
    """
    return _factorize(A)(B)


def implicit_euler_rollout(
    S: Array,
    A: Array,
    u0: Array,
    load: Array,
    dt: float,
    n_steps: int,
    bc_mask: Array | None = None,
    bc_values: Array | None = None,
) -> np.ndarray:
    """Batched implicit-Euler trajectories (float64).

    Solves (S + dt*A) u_t = S u_{t-1} + dt * f for t = 1..n_steps.
    u0: (B, ng) initial mixed coefficients; load: (ng,) or (B, ng).
    If bc_mask/values given, the RHS is BC-lifted each step (matching the
    reference where S, A and L all have bc.apply'd rows:
    FEONet_time_dep_Stokes/assemble_fenics.py:119-136 — there the lifting is
    baked into the operators; we support both conventions).
    Returns (B, n_steps + 1, ng) including u0.
    """
    from scipy.sparse import issparse

    if not issparse(S):
        S = np.asarray(S, dtype=np.float64)
    u0 = np.asarray(u0, dtype=np.float64)
    solve = _factorize(S + dt * A)
    load_b = np.broadcast_to(np.asarray(load, dtype=np.float64), u0.shape)

    traj = np.empty((u0.shape[0], n_steps + 1, u0.shape[1]))
    traj[:, 0] = u0
    u = u0
    for t in range(1, n_steps + 1):
        rhs = ((S @ u.T).T if issparse(S) else u @ S.T) + dt * load_b
        if bc_mask is not None:
            rhs = rhs * (1.0 - bc_mask) + bc_values * bc_mask
        u = solve(rhs)
        traj[:, t] = u
    return traj


def semi_implicit_ns_rollout(
    S: Array,
    A: Array,
    u0: Array,
    load: Array,
    dt: float,
    n_steps: int,
    conv_fn: Callable[[Array], Array],
    conv_row_mask: Array,
) -> np.ndarray:
    """Semi-implicit (IMEX) Navier-Stokes trajectories (float64).

    Viscous/pressure terms implicit, convection explicit (lagged):

        (S + dt*A) u_t = S u_{t-1} + dt * (f - c(u_{t-1}))

    with c the convection operator (true weak trilinear form or group-FEM),
    masked to zero on constrained rows. The standard first-order IMEX
    splitting — one LU factorization amortized over the whole rollout, all
    trajectories batched. New capability beyond the reference (which has
    time-dependent *Stokes* only, FEONet_time_dep_Stokes/); designed for the
    ~50k-DoF batched-ensemble stretch config (SURVEY.md §7 step 7).
    """
    from scipy.sparse import issparse

    if not issparse(S):
        S = np.asarray(S, dtype=np.float64)
    u0 = np.asarray(u0, dtype=np.float64)
    solve = _factorize(S + dt * A)
    load_b = np.broadcast_to(np.asarray(load, dtype=np.float64), u0.shape)
    keep = 1.0 - np.asarray(conv_row_mask, dtype=np.float64)

    traj = np.empty((u0.shape[0], n_steps + 1, u0.shape[1]))
    traj[:, 0] = u0
    u = u0
    for t in range(1, n_steps + 1):
        su = (S @ u.T).T if issparse(S) else u @ S.T
        rhs = su + dt * (load_b - keep * conv_fn(u))
        u = solve(rhs)
        traj[:, t] = u
    return traj
