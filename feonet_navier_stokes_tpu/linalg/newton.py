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


# ---------------------------------------------------------------------------
# Stable-branch (physical) steady-NS solvers
# ---------------------------------------------------------------------------
#
# At the reference's sincos forcing amplitudes the steady system is genuinely
# wild for a large minority of draws (measured at nx=15 / ne=450: 3 of 8 on
# one batch): the from-rest semi-implicit dynamics passes NEAR a root
# (res ~1e-2..1e-3) and then escapes to a finite-time blowup at EVERY dt
# tried (0.02/0.005/0.001) — there is no dynamically reachable steady state.
# Damped Newton (and FEniCS's Newton, the reference's truth generator —
# FEONet_steady_Navier-Stokes/assemble_fenics.py:204-217) still returns a
# machine-precision root for most such draws, but that root is unreachable,
# and near the underlying fold the load->root map is discontinuous — poison
# for operator learning. Whenever the dynamics DOES converge, damped Newton
# finds the SAME root (measured: dist <=1.4e-9 at nx=4 and nx=15).
#
# The solvers below therefore return the DYNAMICALLY REACHABLE root — via
# relaxed Picard from the Stokes solution,
#
#     u <- (1 - w) u + w A^{-1}(f - conv(u)),
#
# with per-sample adaptive relaxation, an IMEX pseudo-time fallback, and a
# near-monotone Newton polish (growth=1.25 forbids basin-hopping) — and
# return HONEST residuals for unreachable draws, which
# Problem.sample_converged then resamples (the reference resamples its
# Newton failures the same way, assemble_fenics.py:239-241). Picard is
# batched: one factorization of A is shared across samples and iterations,
# so a 1000-sample ne=450 truth set costs one LU + a few hundred (B, ng)
# matmuls — far cheaper than 1000 damped-Newton chains.
#
# Why this matters for training (measured at nx=15, Ruiz + exact-inverse
# preconditioning): the LABEL-FREE residual objective is conditioning-
# limited near the root — cond(I + D_r C(u*) D_c M) = 330-880 even though
# the linear part is exactly preconditioned (cond(A+C(u*)) raw: 1.7e4-1.6e5)
# — so residual ~1e-3 coexists with O(1) coefficient error; gradient
# descent parks in flat valleys that a Newton polish either walks back to
# the true root (moving 0.5-1.4 in rel-L2) or stalls in. Label-free-only
# steady-NS training stalls are conditioning-limited, not multi-root;
# supervised/hybrid training against stable-branch labels supplies the
# missing low-curvature directions.


def _stable_picard(apply_A, solve_A, conv, loads, omega, max_iters, tol):
    """Adaptive relaxed-Picard core, batched (B, ng) host float64.

    Tracks the best iterate per sample. A sample that is cycling or
    diverging — residual >10x its best, or no improvement for 40 straight
    iterations (a Picard limit cycle around a spiral fixed point) — has its
    relaxation halved and restarts from its best iterate; smaller w damps
    the oscillation at the cost of a slower linear rate.
    Returns (best_u, best_rel_res, iters).
    """
    loads = np.asarray(loads, dtype=np.float64)
    n = loads.shape[0]
    f_norm = np.maximum(np.linalg.norm(loads, axis=1), 1e-30)
    u = solve_A(loads)
    best = u.copy()
    best_res = np.full(n, np.inf)
    om = np.full(n, float(omega))
    stagnant = np.zeros(n, dtype=int)
    # active set: converged samples (and samples whose relaxation has
    # collapsed — a limit cycle Picard cannot escape; the IMEX fallback /
    # polish stages own those) stop consuming batch work. At a 1000-sample
    # batch the slowest draws otherwise gate full-batch matvecs + LU solves
    # for hundreds of iterations after the bulk has converged.
    act = np.arange(n)
    it = 0
    for it in range(1, max_iters + 1):
        la = loads[act]
        c = conv(u)
        res = np.linalg.norm(apply_A(u) + c - la, axis=1) / f_norm[act]
        better = res < best_res[act] * (1.0 - 1e-3)
        stagnant[act] = np.where(better, 0, stagnant[act] + 1)
        improved = res < best_res[act]
        best[act[improved]] = u[improved]
        best_res[act] = np.minimum(res, best_res[act])
        keep = (best_res[act] >= tol) & (om[act] >= omega * 2.0**-12)
        if not keep.any():
            break
        if not keep.all():
            act = act[keep]
            u = u[keep]
            res = res[keep]
            la = loads[act]
            c = c[keep]
        bad = (~np.isfinite(res)) | (res > 10.0 * np.maximum(best_res[act], tol)) \
            | (stagnant[act] >= 40)
        if bad.any():
            om[act[bad]] *= 0.5
            stagnant[act[bad]] = 0
            u = np.where(bad[:, None], best[act], u)
            c = conv(u)
        u = (1.0 - om[act][:, None]) * u + om[act][:, None] * solve_A(la - c)
    return best, best_res, it


def _polish_batch(us, rels, loads, residual_of, jacobian_of, solve_fn,
                  tol, basin_tol, max_iters):
    """Near-monotone per-sample Newton polish of Picard iterates (in place).

    Only samples already inside the basin (rel_res < basin_tol) are
    polished; growth=1.25 keeps every step from leaving it."""
    for i in range(us.shape[0]):
        if rels[i] < tol or rels[i] > basin_tol:
            continue
        f_norm = max(float(np.linalg.norm(loads[i])), 1e-30)
        u, r, _ = _damped_newton(
            residual_of(loads[i]), jacobian_of(), us[i], f_norm,
            max_iters, tol, growth=1.25, solve_fn=solve_fn,
        )
        if r / f_norm < rels[i]:
            us[i] = u
            rels[i] = r / f_norm
    return us, rels


def stable_solve_ns(
    A: np.ndarray,
    B1: np.ndarray,
    B2: np.ndarray,
    loads: np.ndarray,
    n2: int,
    conv_row_mask: np.ndarray | None = None,
    omega: float = 0.5,
    max_picard: int = 1500,
    tol: float = 1e-10,
    polish_iters: int = 6,
    S: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Batched stable-branch steady-NS solve (dense group-FEM, host f64).

    See the module-section comment above for why the dynamically REACHABLE
    root, not any damped-Newton root, defines the ground truth
    (`ProblemConfig.ns_branch='stable'`). Picard first; samples it cannot
    reach fall back to the IMEX pseudo-time march when the velocity mass
    matrix ``S`` is given (the march IS the reachability definition); a
    near-monotone Newton polish finishes inside the basin. Draws with no
    reachable root keep their honest (large) residual for
    ``Problem.sample_converged`` to resample.
    Returns (u, rel_res, picard_iters), shapes (B, ng), (B,)."""
    from scipy.linalg import lu_factor, lu_solve

    A = np.asarray(A, dtype=np.float64)
    B1 = np.asarray(B1, dtype=np.float64)
    B2 = np.asarray(B2, dtype=np.float64)
    loads = np.atleast_2d(np.asarray(loads, dtype=np.float64))
    mask = None if conv_row_mask is None else np.asarray(conv_row_mask, np.float64)
    lu = lu_factor(A)

    def solve_A(rhs):
        return lu_solve(lu, rhs.T, check_finite=False).T

    def conv(u):
        return _masked_convection_np(u, B1, B2, n2, mask)

    us, rels, it = _stable_picard(
        lambda u: u @ A.T, solve_A, conv, loads, omega, max_picard, tol
    )
    need = rels > 1e-3
    if need.any() and S is not None:
        S = np.asarray(S, dtype=np.float64)

        def solve_sys_of_dt(dt):
            lu_sys = lu_factor(S + dt * A)
            return lambda rhs: lu_solve(lu_sys, rhs.T, check_finite=False).T

        ub, rb = _imex_march(
            solve_sys_of_dt, lambda u: u @ A.T, lambda u: u @ S.T, conv,
            loads[need], tol,
        )
        better = rb < rels[need]
        idx = np.nonzero(need)[0][better]
        us[idx] = ub[better]
        rels[idx] = rb[better]
    us, rels = _polish_batch(
        us, rels, loads,
        residual_of=lambda f: (
            lambda u: u @ A.T + _masked_convection_np(u, B1, B2, n2, mask) - f
        ),
        jacobian_of=lambda: (
            lambda u: _ns_jacobian_np(u, A, B1, B2, n2, mask)
        ),
        solve_fn=np.linalg.solve, tol=tol, basin_tol=1e-3,
        max_iters=polish_iters,
    )
    return us, rels, it


def stable_solve_ns_sparse(
    A_csr,
    B1_csr,
    B2_csr,
    loads: np.ndarray,
    n2: int,
    conv_row_mask: np.ndarray | None = None,
    omega: float = 0.5,
    max_picard: int = 1500,
    tol: float = 1e-10,
    polish_iters: int = 6,
    A_lu=None,
    S=None,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Sparse (SuperLU) twin of ``stable_solve_ns`` for the ~50k-DoF stretch
    scale: one splu(A) shared across samples and Picard iterations; IMEX
    pseudo-time fallback (pass the CSR velocity mass ``S``) for samples
    Picard limit-cycles on; the polish reuses newton_solve_ns_sparse's CSR
    Jacobian with the same near-monotone growth bound."""
    from scipy.sparse import csc_matrix, csr_matrix
    from scipy.sparse.linalg import splu

    A = csr_matrix(A_csr).astype(np.float64)
    B1 = csr_matrix(B1_csr).astype(np.float64)
    B2 = csr_matrix(B2_csr).astype(np.float64)
    loads = np.atleast_2d(np.asarray(loads, dtype=np.float64))
    mask = None if conv_row_mask is None else np.asarray(conv_row_mask, np.float64)
    keep = None if mask is None else (1.0 - mask)
    lu = A_lu if A_lu is not None else splu(csc_matrix(A))

    def conv(u):
        z = np.zeros_like(u[:, 2 * n2:])
        d1 = np.concatenate([u[:, :n2], u[:, :n2], z], axis=-1)
        d2 = np.concatenate([u[:, n2:2 * n2], u[:, n2:2 * n2], z], axis=-1)
        c = d1 * (B1 @ u.T).T + d2 * (B2 @ u.T).T
        return c if keep is None else keep * c

    us, rels, it = _stable_picard(
        lambda u: (A @ u.T).T, lambda r: lu.solve(r.T).T, conv,
        loads, omega, max_picard, tol,
    )
    need = rels > 1e-3
    if need.any() and S is not None:
        S = csr_matrix(S).astype(np.float64)

        def solve_sys_of_dt(dt):
            lu_sys = splu(csc_matrix(S + dt * A))
            return lambda rhs: lu_sys.solve(rhs.T).T

        ub, rb = _imex_march(
            solve_sys_of_dt, lambda u: (A @ u.T).T, lambda u: (S @ u.T).T,
            conv, loads[need], tol,
        )
        better = rb < rels[need]
        idx = np.nonzero(need)[0][better]
        us[idx] = ub[better]
        rels[idx] = rb[better]
    for i in range(us.shape[0]):
        if rels[i] < tol or rels[i] > 1e-3:
            continue
        u, rel, _ = newton_solve_ns_sparse(
            A, B1, B2, loads[i], n2, u0=us[i], conv_row_mask=mask,
            max_iters=polish_iters, tol=tol,
        )
        if rel < rels[i]:
            us[i] = u
            rels[i] = rel
    return us, rels, it


def stable_solve_weak(
    A: np.ndarray,
    conv_fn,
    jac_fn,
    loads: np.ndarray,
    bc_mask: np.ndarray,
    omega: float = 0.5,
    max_picard: int = 1500,
    tol: float = 1e-10,
    polish_iters: int = 6,
    S: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Stable-branch solve of the TRUE weak NS system (fem.nonlinear
    trilinear convection) — the ns_truth='weak' twin of ``stable_solve_ns``,
    with the same IMEX pseudo-time fallback when ``S`` is given.
    conv_fn batches over the leading axis (fem/nonlinear.py)."""
    from scipy.linalg import lu_factor, lu_solve

    A = np.asarray(A, dtype=np.float64)
    loads = np.atleast_2d(np.asarray(loads, dtype=np.float64))
    keep = 1.0 - np.asarray(bc_mask, dtype=np.float64)
    lu = lu_factor(A)

    def conv(u):
        return keep * conv_fn(u)

    us, rels, it = _stable_picard(
        lambda u: u @ A.T,
        lambda r: lu_solve(lu, r.T, check_finite=False).T,
        conv,
        loads, omega, max_picard, tol,
    )
    need = rels > 1e-3
    if need.any() and S is not None:
        S = np.asarray(S, dtype=np.float64)

        def solve_sys_of_dt(dt):
            lu_sys = lu_factor(S + dt * A)
            return lambda rhs: lu_solve(lu_sys, rhs.T, check_finite=False).T

        ub, rb = _imex_march(
            solve_sys_of_dt, lambda u: u @ A.T, lambda u: u @ S.T, conv,
            loads[need], tol,
        )
        better = rb < rels[need]
        idx = np.nonzero(need)[0][better]
        us[idx] = ub[better]
        rels[idx] = rb[better]
    us, rels = _polish_batch(
        us, rels, loads,
        residual_of=lambda f: (lambda u: u @ A.T + keep * conv_fn(u) - f),
        jacobian_of=lambda: (lambda u: A + keep[:, None] * jac_fn(u)),
        solve_fn=np.linalg.solve, tol=tol, basin_tol=1e-3,
        max_iters=polish_iters,
    )
    return us, rels, it


def _imex_march(solve_sys_of_dt, apply_A, apply_S, conv, loads, tol,
                dt0=0.02, max_steps=12000, handoff=3e-4, max_blowups=3):
    """Semi-implicit pseudo-time march to the stable steady state, batched.

    The fallback for samples relaxed Picard cannot reach: the Picard map's
    linearization (-A^{-1} conv') can be unstable around a root that the
    MASS-weighted physical dynamics still attracts (verified: the IMEX march
    converges on every draw where Picard limit-cycles). The march runs at
    FIXED dt — early-transient decay does NOT imply stability at larger dt
    (the step approaches the unstable Picard map as dt grows; growth
    schedules measured as blowup-restart loops on exactly the samples this
    fallback exists for). dt halves only on an actual blowup, and only the
    blown-up samples restart from rest — the rest keep their state.

    Some draws have NO reachable steady state at all: the group-FEM dynamics
    passes near a saddle (res ~1e-2..1e-3) and then escapes to a genuine
    blowup at EVERY dt (measured at nx=4: dt=0.02/0.005/0.001 all diverge
    after closest approach; damped Newton stalls on the same draws). A
    sample that blows up ``max_blowups`` times is written off as rootless —
    its best-along-trajectory residual is returned honestly and
    ``Problem.sample_converged`` resamples it, exactly as the reference
    resamples FEniCS Newton failures (assemble_fenics.py:239-241).
    Stops at ``handoff``: the in-basin Newton polish (basin_tol 1e-3,
    quadratic) finishes to tol — marching the linear-rate IMEX any deeper
    than ~1e-4 just duplicates work the polish does in one iteration."""
    n = loads.shape[0]
    f_norm = np.maximum(np.linalg.norm(loads, axis=1), 1e-30)
    best = np.zeros_like(loads)
    best_res = np.full(n, np.inf)
    blowups = np.zeros(n, dtype=int)
    # active set: rows that reached handoff, or were written off as
    # rootless, stop marching (same outcomes as marching them to the end —
    # see _stable_picard for why full-batch tails dominate the cost)
    act = np.arange(n)
    u = np.zeros_like(loads)  # from rest: the physical trajectory
    dt = float(dt0)
    solve = solve_sys_of_dt(dt)
    for k in range(1, max_steps + 1):
        la = loads[act]
        u = solve(apply_S(u) + dt * (la - conv(u)))
        if k % 50 == 0:
            res = np.linalg.norm(apply_A(u) + conv(u) - la, axis=1) / f_norm[act]
            bad = ~np.isfinite(res)
            if bad.any():
                # blew up (explicit-convection CFL or rootless escape):
                # halve dt, restart only the escapees from rest
                dt *= 0.5
                solve = solve_sys_of_dt(dt)
                blowups[act] += bad
                u[bad] = 0.0
                res[bad] = np.inf
            improved = res < best_res[act]
            best[act[improved]] = u[improved]
            best_res[act] = np.minimum(best_res[act], res)
            keep = (best_res[act] >= max(tol, handoff)) \
                & (blowups[act] < max_blowups)
            if not keep.any():
                break
            if not keep.all():
                act = act[keep]
                u = u[keep]
    return best, best_res
