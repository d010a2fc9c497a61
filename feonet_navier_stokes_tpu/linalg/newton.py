"""Newton solver for the assembled steady Navier-Stokes system.

The discrete system (reference math, derived & validated in
FEONet_steady_Navier-Stokes/compare_ordering_nonlinear.ipynb cells 10-25):

    R(u) = A u + conv(u) - f = 0,
    conv(u) = d1(u) * (B1 u) + d2(u) * (B2 u)

where, in the canonical [u1 | u2 | p] layout, d1 = [u1; u1; 0] and
d2 = [u2; u2; 0] — i.e. every velocity row of B_k u is weighted by the
velocity value at the *same* P2 node (the reference builds this with index
gathers: FEONet_steady_Navier-Stokes/train_FEONet.py:314-322).

The Jacobian is closed-form (no jacfwd materialization):

    J = A + diag(d1) B1 + diag(d2) B2 + T,
    T[r, u1_col(r)] = (B1 u)_r,  T[r, u2_col(r)] = (B2 u)_r   (velocity rows)

replacing the reference notebook's ``torch.autograd.functional.jacobian``
(compare_ordering_nonlinear.ipynb cell 24) and FEniCS's MUMPS-backed Newton
(assemble_fenics.py:206-217).

BC conventions (SURVEY.md "hard parts"): ``bc_rows='masked'`` zeroes the
convection on constrained rows so BC residual rows are exactly u_r - g_r
(the notebook's validated system); ``bc_rows='script'`` reproduces the
training script's bc.apply on B1/B2 (unit diagonal on constrained rows,
assemble_fenics.py:109-117) — then conv must be built from those matrices
with no extra masking.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def velocity_row_maps(n2: int, n1: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(rows, u1_cols, u2_cols): for each velocity row, the u1/u2 column of
    its P2 node in the canonical layout."""
    rows = np.arange(2 * n2)
    node = rows % n2
    return rows, node, node + n2


def masked_convection(
    u: Array, B1: Array, B2: Array, n2: int, conv_row_mask: Array | None = None
) -> Array:
    """conv(u) for batched u of shape (..., ng).

    conv_row_mask: optional (ng,) with 1.0 on rows to zero (BC rows in
    'masked' mode); None reproduces the script behavior when B1/B2 already
    carry bc.apply rows.
    """
    ng = u.shape[-1]
    d1 = jnp.concatenate([u[..., :n2], u[..., :n2], jnp.zeros_like(u[..., 2 * n2 :])], axis=-1)
    d2 = jnp.concatenate(
        [u[..., n2 : 2 * n2], u[..., n2 : 2 * n2], jnp.zeros_like(u[..., 2 * n2 :])],
        axis=-1,
    )
    conv = d1 * (u @ B1.T) + d2 * (u @ B2.T)
    if conv_row_mask is not None:
        conv = conv * (1.0 - conv_row_mask)
    return conv


def ns_residual(
    u: Array,
    A: Array,
    B1: Array,
    B2: Array,
    load: Array,
    n2: int,
    conv_row_mask: Array | None = None,
) -> Array:
    """R(u) = A u + conv(u) - f, batched over leading dims."""
    return u @ A.T + masked_convection(u, B1, B2, n2, conv_row_mask) - load


def _ns_jacobian(
    u: Array,
    A: Array,
    B1: Array,
    B2: Array,
    n2: int,
    conv_row_mask: Array | None,
) -> Array:
    ng = u.shape[-1]
    d1 = jnp.concatenate([u[:n2], u[:n2], jnp.zeros(ng - 2 * n2, u.dtype)])
    d2 = jnp.concatenate([u[n2 : 2 * n2], u[n2 : 2 * n2], jnp.zeros(ng - 2 * n2, u.dtype)])
    J = d1[:, None] * B1 + d2[:, None] * B2
    b1u = B1 @ u
    b2u = B2 @ u
    rows, u1c, u2c = velocity_row_maps(n2, ng - 2 * n2)
    rows_j = jnp.asarray(rows)
    J = J.at[rows_j, jnp.asarray(u1c)].add(b1u[: 2 * n2])
    J = J.at[rows_j, jnp.asarray(u2c)].add(b2u[: 2 * n2])
    if conv_row_mask is not None:
        J = J * (1.0 - conv_row_mask)[:, None]
    return A + J


def _damped_newton(
    residual_fn,
    jacobian_fn,
    u0: Array,
    f_norm: Array,
    max_iters: int,
    tol: float,
    growth: float = 3.0,
) -> tuple[Array, Array, Array]:
    """Shared Newton core with non-monotone damping.

    The full step is taken unless it grows |R| by more than ``growth``x, in
    which case it is halved (up to 8 times). Allowing transient growth beats
    strict backtracking on these saddle-point systems (strict monotone line
    search stalls; FEniCS's relaxed Newton behaves similarly).
    Returns (u, rel_residual, iterations).
    """

    def res_norm(u):
        return jnp.linalg.norm(residual_fn(u))

    def cond(state):
        _, r, it = state
        return jnp.logical_and(r / f_norm > tol, it < max_iters)

    def body(state):
        u, r, it = state
        R = residual_fn(u)
        J = jacobian_fn(u)
        du = jnp.linalg.solve(J, -R)

        def ls_cond(ls):
            step, rn = ls
            return jnp.logical_and(rn > growth * r, step > 1.0 / 256.0)

        def ls_body(ls):
            step, _ = ls
            return step * 0.5, res_norm(u + step * 0.5 * du)

        step, rn = jax.lax.while_loop(ls_cond, ls_body, (jnp.asarray(1.0, u.dtype), res_norm(u + du)))
        return u + step * du, rn, it + 1

    return jax.lax.while_loop(cond, body, (u0, res_norm(u0), jnp.asarray(0)))


@partial(jax.jit, static_argnames=("n2", "max_iters", "tol"))
def newton_solve_ns(
    A: Array,
    B1: Array,
    B2: Array,
    load: Array,
    n2: int,
    u0: Array | None = None,
    conv_row_mask: Array | None = None,
    max_iters: int = 30,
    tol: float = 1e-10,
) -> tuple[Array, Array, Array]:
    """Newton on the group-FEM system for one sample.

    Returns (u, final |R|/|f|, iterations). Convergence is NOT guaranteed for
    every forcing draw — the reference's FEniCS Newton also fails and
    RESAMPLES (FEONet_steady_Navier-Stokes/assemble_fenics.py:204-241); use
    the problem layer's resampling pipeline for dataset generation.
    vmap/lax.map over samples for batches.
    """
    if u0 is None:
        # Stokes solve (drop convection) as the initial guess — the standard
        # continuation start; FEniCS starts from 0 but takes more steps.
        u0 = jnp.linalg.solve(A, load)
    f_norm = jnp.maximum(jnp.linalg.norm(load), 1e-30)
    u, r, it = _damped_newton(
        lambda u: ns_residual(u, A, B1, B2, load, n2, conv_row_mask),
        lambda u: _ns_jacobian(u, A, B1, B2, n2, conv_row_mask),
        u0,
        f_norm,
        max_iters,
        tol,
    )
    return u, r / f_norm, it


@partial(jax.jit, static_argnames=("conv_fn", "jac_fn", "max_iters", "tol", "n_continuation"))
def newton_solve_weak(
    A: Array,
    conv_fn,
    jac_fn,
    load: Array,
    bc_mask: Array,
    u0: Array | None = None,
    max_iters: int = 25,
    tol: float = 1e-11,
    n_continuation: int = 4,
) -> tuple[Array, Array, Array]:
    """Newton on the TRUE weak NS system A u + c(u) - f = 0.

    conv_fn/jac_fn from ``fem.nonlinear.make_true_convection`` (static —
    close over the space). BC rows of the convection are zeroed so
    constrained rows read u_r - g_r exactly. Uses convection-strength
    continuation (gamma = 1/n, 2/n, .., 1) with warm starts, the equivalent
    of FEniCS's relaxation for harder draws. Returns (u, rel_res, iters).
    """
    keep = 1.0 - bc_mask

    def make_fns(gamma):
        def res(u):
            return u @ A.T + gamma * keep * conv_fn(u) - load

        def jac(u):
            return A + gamma * keep[:, None] * jac_fn(u)

        return res, jac

    if u0 is None:
        u0 = jnp.linalg.solve(A, load)
    f_norm = jnp.maximum(jnp.linalg.norm(load), 1e-30)

    u = u0
    total_it = jnp.asarray(0)
    for k in range(1, n_continuation + 1):
        gamma = k / n_continuation
        res, jac = make_fns(gamma)
        u, r, it = _damped_newton(res, jac, u, f_norm, max_iters, tol)
        total_it = total_it + it
    return u, r / f_norm, total_it
