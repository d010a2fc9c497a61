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

Two implementations live here on purpose:
  * ``masked_convection`` / ``ns_residual`` — jnp, device-dtype, used inside
    the jitted training loss (residual/losses.py);
  * the Newton solvers — host numpy float64 UNCONDITIONALLY (ground-truth
    generation; tol=1e-10 is unreachable in f32, and TPU backends silently
    truncate f64 without x64 — see fem/assemble.py's placement rationale).

BC conventions (SURVEY.md "hard parts"): ``bc_rows='masked'`` zeroes the
convection on constrained rows so BC residual rows are exactly u_r - g_r
(the notebook's validated system); ``bc_rows='script'`` reproduces the
training script's bc.apply on B1/B2 (unit diagonal on constrained rows,
assemble_fenics.py:109-117) — then conv must be built from those matrices
with no extra masking.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

Array = Any


def velocity_row_maps(n2: int, n1: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(rows, u1_cols, u2_cols): for each velocity row, the u1/u2 column of
    its P2 node in the canonical layout."""
    rows = np.arange(2 * n2)
    node = rows % n2
    return rows, node, node + n2


def masked_convection(
    u: Array, B1: Array, B2: Array, n2: int, conv_row_mask: Array | None = None,
    precision=None,
) -> Array:
    """conv(u) for batched u of shape (..., ng) — jnp, device training path.

    conv_row_mask: optional (ng,) with 1.0 on rows to zero (BC rows in
    'masked' mode); None reproduces the script behavior when B1/B2 already
    carry bc.apply rows.
    """
    d1 = jnp.concatenate(
        [u[..., :n2], u[..., :n2], jnp.zeros_like(u[..., 2 * n2 :])], axis=-1
    )
    d2 = jnp.concatenate(
        [u[..., n2 : 2 * n2], u[..., n2 : 2 * n2], jnp.zeros_like(u[..., 2 * n2 :])],
        axis=-1,
    )
    conv = d1 * jnp.matmul(u, B1.T, precision=precision) + d2 * jnp.matmul(
        u, B2.T, precision=precision
    )
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
    """R(u) = A u + conv(u) - f, batched over leading dims (jnp)."""
    return u @ A.T + masked_convection(u, B1, B2, n2, conv_row_mask) - load


def _masked_convection_np(
    u: np.ndarray,
    B1: np.ndarray,
    B2: np.ndarray,
    n2: int,
    conv_row_mask: np.ndarray | None,
) -> np.ndarray:
    """Float64 numpy twin of ``masked_convection`` for the Newton path."""
    z = np.zeros_like(u[..., 2 * n2 :])
    d1 = np.concatenate([u[..., :n2], u[..., :n2], z], axis=-1)
    d2 = np.concatenate([u[..., n2 : 2 * n2], u[..., n2 : 2 * n2], z], axis=-1)
    conv = d1 * (u @ B1.T) + d2 * (u @ B2.T)
    if conv_row_mask is not None:
        conv = conv * (1.0 - conv_row_mask)
    return conv


def _ns_jacobian_np(
    u: np.ndarray,
    A: np.ndarray,
    B1: np.ndarray,
    B2: np.ndarray,
    n2: int,
    conv_row_mask: np.ndarray | None,
) -> np.ndarray:
    ng = u.shape[-1]
    zeros = np.zeros(ng - 2 * n2)
    d1 = np.concatenate([u[:n2], u[:n2], zeros])
    d2 = np.concatenate([u[n2 : 2 * n2], u[n2 : 2 * n2], zeros])
    J = d1[:, None] * B1 + d2[:, None] * B2
    b1u = B1 @ u
    b2u = B2 @ u
    rows, u1c, u2c = velocity_row_maps(n2, ng - 2 * n2)
    J[rows, u1c] += b1u[: 2 * n2]
    J[rows, u2c] += b2u[: 2 * n2]
    if conv_row_mask is not None:
        J *= (1.0 - conv_row_mask)[:, None]
    return A + J


def _damped_newton(
    residual_fn,
    jacobian_fn,
    u0: np.ndarray,
    f_norm: float,
    max_iters: int,
    tol: float,
    growth: float = 3.0,
    solve_fn=None,
) -> tuple[np.ndarray, float, int]:
    """Shared Newton core with non-monotone damping (host numpy).

    The full step is taken unless it grows |R| by more than ``growth``x, in
    which case it is halved (up to 8 times). Allowing transient growth beats
    strict backtracking on these saddle-point systems (strict monotone line
    search stalls; FEniCS's relaxed Newton behaves similarly).
    ``solve_fn(J, b)`` is the linear solve (default dense LU) — the sparse
    path passes a SuperLU solve so both share one damping policy.
    Returns (u, final |R|, iterations).
    """
    if solve_fn is None:
        solve_fn = np.linalg.solve
    u = np.asarray(u0, dtype=np.float64)
    r = float(np.linalg.norm(residual_fn(u)))
    it = 0
    while r / f_norm > tol and it < max_iters:
        R = residual_fn(u)
        J = jacobian_fn(u)
        du = solve_fn(J, -R)
        step = 1.0
        rn = float(np.linalg.norm(residual_fn(u + du)))
        while rn > growth * r and step > 1.0 / 256.0:
            step *= 0.5
            rn = float(np.linalg.norm(residual_fn(u + step * du)))
        u = u + step * du
        r = rn
        it += 1
    return u, r, it


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
) -> tuple[np.ndarray, float, int]:
    """Newton on the group-FEM system for one sample (host float64).

    Returns (u, final |R|/|f|, iterations). Convergence is NOT guaranteed for
    every forcing draw — the reference's FEniCS Newton also fails and
    RESAMPLES (FEONet_steady_Navier-Stokes/assemble_fenics.py:204-241); use
    the problem layer's resampling pipeline for dataset generation.
    """
    A = np.asarray(A, dtype=np.float64)
    B1 = np.asarray(B1, dtype=np.float64)
    B2 = np.asarray(B2, dtype=np.float64)
    load = np.asarray(load, dtype=np.float64)
    mask = None if conv_row_mask is None else np.asarray(conv_row_mask, np.float64)
    if u0 is None:
        # Stokes solve (drop convection) as the initial guess — the standard
        # continuation start; FEniCS starts from 0 but takes more steps.
        u0 = np.linalg.solve(A, load)
    f_norm = max(float(np.linalg.norm(load)), 1e-30)
    u, r, it = _damped_newton(
        lambda u: np.asarray(u @ A.T + _masked_convection_np(u, B1, B2, n2, mask) - load),
        lambda u: _ns_jacobian_np(u, A, B1, B2, n2, mask),
        np.asarray(u0, dtype=np.float64),
        f_norm,
        max_iters,
        tol,
    )
    return u, r / f_norm, it


def newton_solve_ns_sparse(
    A_csr,
    B1_csr,
    B2_csr,
    load: np.ndarray,
    n2: int,
    u0: np.ndarray | None = None,
    conv_row_mask: np.ndarray | None = None,
    max_iters: int = 30,
    tol: float = 1e-10,
    A_lu=None,
) -> tuple[np.ndarray, float, int]:
    """Sparse (SuperLU) twin of ``newton_solve_ns`` for the ~50k-DoF stretch
    scale, where a dense Jacobian is 18 GB. Same group-FEM system, same
    damped-Newton core; the Jacobian is assembled in CSR (diag-scaled B1/B2
    plus the 2-entries-per-velocity-row gather term) and factorized with
    scipy splu per iteration. Pass ``A_lu = splu(A.tocsc())`` to reuse the
    Stokes factorization for the initial guess across a batch.
    No reference counterpart (its MUMPS Newton runs only at ng<=14803 in a
    notebook); required by BASELINE.json's 50k stretch goal."""
    from scipy.sparse import csc_matrix, csr_matrix, diags, coo_matrix
    from scipy.sparse.linalg import splu

    A = csr_matrix(A_csr).astype(np.float64)
    B1 = csr_matrix(B1_csr).astype(np.float64)
    B2 = csr_matrix(B2_csr).astype(np.float64)
    load = np.asarray(load, dtype=np.float64)
    ng = A.shape[0]
    n1 = ng - 2 * n2
    mask = None if conv_row_mask is None else np.asarray(conv_row_mask, np.float64)
    keep = None if mask is None else (1.0 - mask)

    def conv(u):
        z = np.zeros(n1)
        d1 = np.concatenate([u[:n2], u[:n2], z])
        d2 = np.concatenate([u[n2 : 2 * n2], u[n2 : 2 * n2], z])
        c = d1 * (B1 @ u) + d2 * (B2 @ u)
        return c if keep is None else keep * c

    def residual(u):
        return A @ u + conv(u) - load

    rows, u1c, u2c = velocity_row_maps(n2, n1)

    def jacobian(u):
        z = np.zeros(n1)
        d1 = np.concatenate([u[:n2], u[:n2], z])
        d2 = np.concatenate([u[n2 : 2 * n2], u[n2 : 2 * n2], z])
        J = diags(d1) @ B1 + diags(d2) @ B2
        b1u = B1 @ u
        b2u = B2 @ u
        T = coo_matrix(
            (
                np.concatenate([b1u[: 2 * n2], b2u[: 2 * n2]]),
                (
                    np.concatenate([rows, rows]),
                    np.concatenate([u1c, u2c]),
                ),
            ),
            shape=(ng, ng),
        )
        J = (J + T).tocsr()
        if keep is not None:
            J = diags(keep) @ J
        return (A + J).tocsc()

    if u0 is None:
        lu = A_lu if A_lu is not None else splu(csc_matrix(A))
        u0 = lu.solve(load)
    f_norm = max(float(np.linalg.norm(load)), 1e-30)
    u, r, it = _damped_newton(
        residual,
        jacobian,
        np.asarray(u0, dtype=np.float64),
        f_norm,
        max_iters,
        tol,
        solve_fn=lambda J, b: splu(J).solve(b),
    )
    return u, r / f_norm, it


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
) -> tuple[np.ndarray, float, int]:
    """Newton on the TRUE weak NS system A u + c(u) - f = 0 (host float64).

    conv_fn/jac_fn from ``fem.nonlinear.make_true_convection``. BC rows of
    the convection are zeroed so constrained rows read u_r - g_r exactly.
    Uses convection-strength continuation (gamma = 1/n, 2/n, .., 1) with warm
    starts, the equivalent of FEniCS's relaxation for harder draws.
    Returns (u, rel_res, iters).
    """
    A = np.asarray(A, dtype=np.float64)
    load = np.asarray(load, dtype=np.float64)
    keep = 1.0 - np.asarray(bc_mask, dtype=np.float64)

    def make_fns(gamma):
        def res(u):
            return u @ A.T + gamma * keep * conv_fn(u) - load

        def jac(u):
            return A + gamma * keep[:, None] * jac_fn(u)

        return res, jac

    if u0 is None:
        u0 = np.linalg.solve(A, load)
    f_norm = max(float(np.linalg.norm(load)), 1e-30)

    u = np.asarray(u0, dtype=np.float64)
    total_it = 0
    r = 0.0
    for k in range(1, n_continuation + 1):
        gamma = k / n_continuation
        res, jac = make_fns(gamma)
        u, r, it = _damped_newton(res, jac, u, f_norm, max_iters, tol)
        total_it += it
    return u, r / f_norm, total_it
