"""Ground-truth dense solvers (steady solve + implicit-Euler rollout).

Replaces the reference's per-sample ``np.linalg.solve`` loops:
  * steady:  coeff_u = solve(matrix, load_vector) per sample
    (reference: FEONet_Stokes_square/create_data.py:63-67) — here one
    LU factorization shared across the whole batch.
  * time-dependent: 101-step rollout of
    solve(S + dt*A, S u + dt f) (reference:
    FEONet_time_dep_Stokes/create_data.py:75-91) — here ``lax.scan`` over the
    prefactorized system, all trajectories batched on the MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.linalg import lu_factor, lu_solve

Array = jax.Array


def solve_dense(A: Array, b: Array) -> Array:
    """Single solve A x = b."""
    return jnp.linalg.solve(A, b)


@jax.jit
def solve_dense_batched(A: Array, B: Array) -> Array:
    """Solve A x_i = b_i for a batch B of shape (n_samples, n).

    One factorization, one triangular-solve batch — the reference's
    O(n^3)-per-sample loop collapses to O(n^3) + O(n_samples n^2).
    """
    lu, piv = lu_factor(A)
    return lu_solve((lu, piv), B.T).T


@partial(jax.jit, static_argnames=("n_steps",))
def implicit_euler_rollout(
    S: Array,
    A: Array,
    u0: Array,
    load: Array,
    dt: float,
    n_steps: int,
    bc_mask: Array | None = None,
    bc_values: Array | None = None,
) -> Array:
    """Batched implicit-Euler trajectories.

    Solves (S + dt*A) u_t = S u_{t-1} + dt * f for t = 1..n_steps.
    u0: (B, ng) initial mixed coefficients; load: (ng,) or (B, ng).
    If bc_mask/values given, the RHS is BC-lifted each step (matching the
    reference where S, A and L all have bc.apply'd rows:
    FEONet_time_dep_Stokes/assemble_fenics.py:119-136 — there the lifting is
    baked into the operators; we support both conventions).
    Returns (B, n_steps + 1, ng) including u0.
    """
    sys = S + dt * A
    lu, piv = lu_factor(sys)
    load_b = jnp.broadcast_to(load, u0.shape)

    def step(u, _):
        rhs = u @ S.T + dt * load_b
        if bc_mask is not None:
            rhs = rhs * (1.0 - bc_mask) + bc_values * bc_mask
        u_next = lu_solve((lu, piv), rhs.T).T
        return u_next, u_next

    _, traj = jax.lax.scan(step, u0, None, length=n_steps)
    return jnp.concatenate([u0[:, None, :], jnp.swapaxes(traj, 0, 1)], axis=1)


@partial(jax.jit, static_argnames=("n_steps", "conv_fn"))
def semi_implicit_ns_rollout(
    S: Array,
    A: Array,
    u0: Array,
    load: Array,
    dt: float,
    n_steps: int,
    conv_fn,
    conv_row_mask: Array,
) -> Array:
    """Semi-implicit (IMEX) Navier-Stokes trajectories.

    Viscous/pressure terms implicit, convection explicit (lagged):

        (S + dt*A) u_t = S u_{t-1} + dt * (f - c(u_{t-1}))

    with c the convection operator (true weak trilinear form or group-FEM),
    masked to zero on constrained rows. The standard first-order IMEX
    splitting — one LU factorization amortized over the whole rollout, all
    trajectories batched. New capability beyond the reference (which has
    time-dependent *Stokes* only, FEONet_time_dep_Stokes/); designed for the
    ~50k-DoF batched-ensemble stretch config (SURVEY.md §7 step 7).
    """
    sys = S + dt * A
    lu, piv = lu_factor(sys)
    load_b = jnp.broadcast_to(load, u0.shape)
    keep = 1.0 - conv_row_mask

    def step(u, _):
        rhs = u @ S.T + dt * (load_b - keep * conv_fn(u))
        u_next = lu_solve((lu, piv), rhs.T).T
        return u_next, u_next

    _, traj = jax.lax.scan(step, u0, None, length=n_steps)
    return jnp.concatenate([u0[:, None, :], jnp.swapaxes(traj, 0, 1)], axis=1)
