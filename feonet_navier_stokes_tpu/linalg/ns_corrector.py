"""Solver-free defect correctors for the Navier-Stokes problems.

Round-4 solved time-dependent Stokes by a two-stage cascade whose stage 2 is
a closed-form-fitted linear recurrence on the DEFECT of a frozen stage-1
network (linalg/linear_fit.py:defect_step_fit, traj 2.87e-6 at ne=200).
This module ports that construction to the two nonlinear problems:

* **steady NS** (``steady_defect_fit``): the defect e = u* - u0 of a frozen
  stage-1 prediction satisfies the exactly-quadratic system

      J(u0) e + Q(e, e) = r0,        r0 = f - A u0 - conv(u0),

  so the map r0 -> e is linear up to O(|e|^2) with a Jacobian that varies
  only by the (small) convection differences between samples. One ridge
  least-squares fit over (residual, exact-defect) pairs — the defects come
  FREE from the cached ground truths, no extra solves — recovers an averaged
  inverse Jacobian W ~ J̄^{-1}; iterating ``u <- u + W r(u)`` is a LEARNED
  quasi-Newton method whose per-step cost is einsums + one (ng x ng) matmul:
  no factorization or solver in the deployment path.

* **timedep NS** (``tdns_step_fit``): the IMEX truth scheme
  (linalg/solvers.py:semi_implicit_ns_rollout)

      sys c_t = S c_{t-1} + dt (f - conv(c_{t-1})),   sys = S + dt A,

  keeps every step LINEAR given the previous state, so the defect
  e_t = c_t - u0_t of a frozen stage-1 trajectory obeys  e_t = sys^{-1} g_t
  with g_t assembled from known quantities (stage-1 residual + bilinear
  convection increments — see ``_tdns_g``). The map g -> e IS a fixed
  (ng x ng) matrix; one least-squares fit over exact-defect-labeled rows
  recovers it to machine precision, and inference is a T-step rollout of
  einsums + matmuls (the timedep-Stokes LinearStep story, carried through
  the nonlinearity by computing the convection increment with the
  POLARIZED bilinear form Q(a,b) instead of the cancellation-doomed
  conv(u0+e) - conv(u0)).

All fits are host float64; ``apply_*`` run at a chosen inference dtype
(float32 = the deployed-head convention of defect_step_fit).

The reference trains its NS problems by residual descent only and never
corrects a trained model (FEONet_steady_Navier-Stokes/train_FEONet.py:
301-332; it has no time-dependent NS at all) — no counterpart.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

__all__ = [
    "steady_weak_residual",
    "steady_defect_fit",
    "apply_steady_defect_fit",
    "tdns_step_fit",
    "apply_tdns_step_fit",
]


def _keep(problem) -> np.ndarray:
    return 1.0 - np.asarray(problem.bc.mask, dtype=np.float64)


def _dense64(M) -> np.ndarray:
    if hasattr(M, "toarray"):
        return np.asarray(M.toarray(), dtype=np.float64)
    return np.asarray(M, dtype=np.float64)


def _conv_pair(problem, dtype) -> Callable:
    from ..fem.nonlinear import make_convection_pair

    cache = getattr(problem, "_conv_pair_cache", None)
    if cache is None:
        cache = problem._conv_pair_cache = {}
    key = np.dtype(dtype).name
    if key not in cache:
        cache[key] = make_convection_pair(problem.space, dtype=dtype)
    return cache[key]


# ---------------------------------------------------------------------------
# steady NS
# ---------------------------------------------------------------------------


def steady_weak_residual(
    problem, u: np.ndarray, loads: np.ndarray, dtype=np.float64
) -> np.ndarray:
    """Batched residual of the TRUE weak system r = f - A_truth u - conv(u).

    This is the system the ground truth solves (ns_truth='weak'); the
    assembled group-FEM training system differs from it by the ~1.7e-3
    quadrature/representation gap (fem/nonlinear.py module docstring), so a
    corrector that iterates on the group residual would stall exactly there.
    """
    c = problem.config
    if c.name != "steady_ns":
        raise ValueError(f"steady_weak_residual requires steady_ns, got {c.name!r}")
    if c.ns_truth != "weak":
        raise ValueError("steady correctors require ns_truth='weak' "
                         "(the A_truth64/_conv_fn system)")
    Q = _conv_pair(problem, dtype)
    A = np.asarray(_dense64(problem.A_truth64), dtype=dtype)
    keep = _keep(problem).astype(dtype)
    u = np.asarray(u, dtype=dtype)
    loads = np.asarray(loads, dtype=dtype)
    return loads - u @ A.T - keep * Q(u, u)


def _lstsq_ridge(X: np.ndarray, Y: np.ndarray, ridge: float) -> np.ndarray:
    G = X.T @ X
    if ridge > 0:
        G = G + ridge * np.trace(G) / G.shape[0] * np.eye(G.shape[0])
    return np.linalg.solve(G, X.T @ Y)


def _steady_stage(problem, u, loads, Q, keep, Wab, dtype):
    """One corrector stage: plain inverse-Jacobian estimate, then refine
    through the convection-feature map. Einsums + matmuls only."""
    Wa, Wb = Wab
    r = steady_weak_residual(problem, u, loads, dtype=dtype)
    ea = r @ Wa[:-1] + Wa[-1]
    if Wb is None:
        return u + ea
    ones = np.ones((u.shape[0], 1), dtype=dtype)
    X = np.concatenate(
        [r, keep * (Q(u, ea) + Q(ea, u)), keep * Q(ea, ea), ones], axis=1)
    return u + X @ Wb


def steady_defect_fit(
    problem,
    u0: np.ndarray,
    truth: np.ndarray,
    loads: np.ndarray,
    ridge: float = 1e-10,
    stages: int = 3,
    conv_features: bool = True,
) -> dict[str, Any]:
    """Fit a boosted sequence of solver-free correction stages.

    Each stage k holds two least-squares maps fitted on the CURRENT defects
    e_k = truth - u_k of the fit set:

      (a) a plain averaged inverse Jacobian  ê = [r | 1] Wa   (W ~ J̄^{-1});
      (b) a refinement through the polarized convection features
          e ≈ [r | keep∘(Q(u,ê)+Q(ê,u)) | keep∘Q(ê,ê) | 1] Wb — the
          features inject the PER-SAMPLE Jacobian variation that no single
          constant W can express (J(u) e = r - Q(e,e) with J = A + C_lin(u),
          so given ê ≈ e the map to e is the constant A^{-1}).

    Boosting (successive stages fitted on the post-correction defects)
    replaces the naive fixed-point iteration of one W, which is expansive
    exactly where Picard is on this problem (linalg/newton.py stable-branch
    notes). The defects are free labels: e = cached truth - stage-1
    prediction, no solves anywhere.

    MEASURED LIMIT (round 5): on the real ne=450 stage-1 this — and every
    solver-free variant probed — fails to contract: per-sample convection-
    Jacobian variation is O(1) there, and per-sample defects keep a 0.4-1%
    component outside any common PCA subspace that cond(J)~1e4 amplifies
    (runs/r5/forensic_*.py, docs/conditioning.md section 6c). Use
    Problem.refine_ns(steps=1) — the per-sample linear defect solve — as
    the steady corrector in that regime; this construction is for the
    mild-Jacobian-variation regimes where it provably contracts
    (tests/test_ns_corrector.py).

    u0:    (B, ng) frozen stage-1 predictions in SOLUTION coordinates
    truth: (B, ng) cached ground truths for the same samples
    loads: (B, ng) BC-applied weak-form load vectors (problem.load64)

    Returns {'stages': [(Wa, Wb), ...] f32, 'fit_rel': [per-stage float],
    'train_contraction': float} — fit_rel[k] is stage k's relative residual
    on the fit set; train_contraction the overall |e_final|/|e_0| there.
    """
    u = np.asarray(u0, dtype=np.float64).copy()
    truth = np.asarray(truth, dtype=np.float64)
    keep = _keep(problem)
    Q = _conv_pair(problem, np.float64)
    B = u.shape[0]
    ones = np.ones((B, 1))
    e0_norm = np.linalg.norm(truth - u)
    out_stages: list[tuple[np.ndarray, np.ndarray | None]] = []
    fit_rels: list[float] = []
    for _ in range(max(stages, 1)):
        e = truth - u
        r = steady_weak_residual(problem, u, loads)
        Wa = _lstsq_ridge(np.concatenate([r, ones], axis=1), e, ridge)
        if conv_features:
            ea = r @ Wa[:-1] + Wa[-1]
            X = np.concatenate(
                [r, keep * (Q(u, ea) + Q(ea, u)), keep * Q(ea, ea), ones],
                axis=1)
            Wb = _lstsq_ridge(X, e, ridge)
            fit_rels.append(float(np.linalg.norm(X @ Wb - e)
                                  / max(np.linalg.norm(e), 1e-30)))
            u = u + X @ Wb
        else:
            Wb = None
            fit_rels.append(float(np.linalg.norm(
                np.concatenate([r, ones], axis=1) @ Wa - e)
                / max(np.linalg.norm(e), 1e-30)))
            u = u + r @ Wa[:-1] + Wa[-1]
        out_stages.append((Wa.astype(np.float32),
                           None if Wb is None else Wb.astype(np.float32)))
    return {
        "stages": out_stages,
        "fit_rel": fit_rels,
        "train_contraction": float(
            np.linalg.norm(truth - u) / max(e0_norm, 1e-30)),
    }


def apply_steady_defect_fit(
    fit: dict[str, Any],
    problem,
    loads: np.ndarray,
    u0: np.ndarray,
    iters: int | None = None,
    dtype=np.float32,
) -> np.ndarray:
    """Apply the boosted correction stages (``iters`` limits how many).

    Solver-free inference: each stage is one batched weak-residual
    evaluation + polarized convection features (einsums) + two (ng x ng)-
    class matmuls, at ``dtype`` (float32 = the deployed-head convention).
    Returns the corrected (B, ng) coefficients.
    """
    keep = _keep(problem).astype(dtype)
    Q = _conv_pair(problem, dtype)
    u = np.asarray(u0, dtype=dtype).copy()
    loads = np.asarray(loads, dtype=dtype)
    stages = fit["stages"]
    if iters is not None:
        stages = stages[: max(iters, 0)]
    for Wa, Wb in stages:
        Wab = (np.asarray(Wa, dtype),
               None if Wb is None else np.asarray(Wb, dtype))
        u = _steady_stage(problem, u, loads, Q, keep, Wab, dtype)
    return u


# ---------------------------------------------------------------------------
# timedep NS
# ---------------------------------------------------------------------------


def _tdns_g(
    problem,
    U0: np.ndarray,
    e_prev: np.ndarray,
    t: int,
    R_t: np.ndarray,
    S,
    Q,
    keep: np.ndarray,
) -> np.ndarray:
    """g_t such that the exact defect step is e_t = sys^{-1} g_t.

    g_t = R_t + S e_{t-1} - dt * keep∘[Q(u_prev, e) + Q(e, u_prev) + Q(e, e)]

    with u_prev = U0[:, t-1] the stage-1 state entering step t and R_t its
    per-step residual under the true IMEX scheme. Every term is O(|e|) or
    O(|R|) and none is formed by subtracting O(1) quantities, so the float32
    inference path keeps full relative accuracy on the defect.
    """
    dt = problem.config.dt
    u_prev = U0[:, t - 1]
    dconv = Q(u_prev, e_prev) + Q(e_prev, u_prev) + Q(e_prev, e_prev)
    Se = (S @ e_prev.T).T if hasattr(S, "tocsr") else e_prev @ S.T
    return R_t + Se - dt * (keep * dconv)


def _tdns_stage1_residual(
    problem, U0: np.ndarray, S, sys, Q, keep: np.ndarray, load_const
) -> np.ndarray:
    """Per-step residuals R_t of a stage-1 trajectory under the true scheme:

        R_t = S u0_{t-1} + dt (f - conv(u0_{t-1})) - sys u0_t,  t = 1..T.

    U0: (B, T+1, ng) physical stage-1 trajectory INCLUDING u_init at t=0.
    """
    dt = problem.config.dt
    prev = U0[:, :-1]  # (B, T, ng)
    cur = U0[:, 1:]
    conv = keep * Q(prev, prev)

    def mat(M, X):
        if hasattr(M, "tocsr"):
            flat = X.reshape(-1, X.shape[-1])
            return np.asarray((M @ flat.T).T).reshape(X.shape)
        return X @ M.T

    return mat(S, prev) + dt * (load_const - conv) - mat(sys, cur)


def tdns_step_fit(
    problem,
    batch: dict,
    u0_traj: np.ndarray,
    ridge: float = 0.0,
) -> dict[str, Any]:
    """Fit the defect step map g -> e (= sys^{-1}) for timedep_ns.

    batch:   a sampled batch (u_init + featurization) — used for the exact
             defect labels via the true IMEX rollout (Problem.ground_truth)
    u0_traj: (B, T, ng) frozen stage-1 trajectory in PHYSICAL coordinates
             (t = 1..T, excluding the initial condition)

    Returns {'W': (ng+1, ng) f32, 'fit_rel': float}. fit_rel ~ machine
    precision certifies the linear-step identity (the analog of
    defect_step_fit's 8e-14 on timedep Stokes).
    """
    c = problem.config
    if c.name != "timedep_ns":
        raise ValueError(f"tdns_step_fit requires timedep_ns, got {c.name!r}")
    u0_traj = np.asarray(u0_traj, dtype=np.float64)
    B, T, ng = u0_traj.shape
    truth = problem.ground_truth(batch, n_steps=T)  # (B, T+1, ng) f64
    u_init = truth[:, 0]
    U0 = np.concatenate([u_init[:, None], u0_traj], axis=1)
    e = truth - U0  # (B, T+1, ng), e_0 = 0
    keep = _keep(problem)
    Q = _conv_pair(problem, np.float64)
    S, sys = problem.S64, problem.sys64
    R = _tdns_stage1_residual(problem, U0, S, sys, Q, keep,
                              np.asarray(problem.load_const64, np.float64))
    rows_X = np.empty((B * T, ng), dtype=np.float64)
    rows_Y = np.empty((B * T, ng), dtype=np.float64)
    for t in range(1, T + 1):
        g = _tdns_g(problem, U0, e[:, t - 1], t, R[:, t - 1], S, Q, keep)
        rows_X[(t - 1) * B : t * B] = g
        rows_Y[(t - 1) * B : t * B] = e[:, t]
    if B * T < ng + 1:
        raise ValueError(
            f"need n_samples*T >= ng+1 rows to identify the step map "
            f"(have {B * T}, need {ng + 1})")
    X = np.concatenate([rows_X, np.ones((B * T, 1))], axis=1)
    if ridge > 0:
        G = X.T @ X + ridge * np.eye(X.shape[1])
        W = np.linalg.solve(G, X.T @ rows_Y)
    else:
        W, *_ = np.linalg.lstsq(X, rows_Y, rcond=None)
    fit_rel = float(np.linalg.norm(X @ W - rows_Y) / np.linalg.norm(rows_Y))
    return {"W": W.astype(np.float32), "fit_rel": fit_rel}


def apply_tdns_step_fit(
    fit: dict[str, Any],
    problem,
    batch: dict,
    u0_traj: np.ndarray,
    dtype=np.float32,
) -> np.ndarray:
    """Roll out the fitted defect recurrence at inference dtype.

    Returns the corrected (B, T, ng) trajectory u0 + e. Per step:
    stage-1 residual R_t (matvecs), bilinear convection increments
    (einsums), one (ng x ng) matmul — no solver.
    """
    c = problem.config
    u0_traj = np.asarray(u0_traj, dtype=dtype)
    B, T, ng = u0_traj.shape
    u_init = np.asarray(problem.u_init64(batch), dtype=dtype)
    U0 = np.concatenate([u_init[:, None], u0_traj], axis=1)
    keep = _keep(problem).astype(dtype)
    Q = _conv_pair(problem, dtype)
    S = _dense64(problem.S64).astype(dtype)
    sys = _dense64(problem.sys64).astype(dtype)
    load_const = np.asarray(problem.load_const64, dtype=dtype)
    R = _tdns_stage1_residual(problem, U0, S, sys, Q, keep, load_const)
    W = np.asarray(fit["W"], dtype=dtype)
    Wg, b = W[:-1], W[-1]
    out = np.empty((B, T, ng), dtype=dtype)
    e = np.zeros((B, ng), dtype=dtype)
    for t in range(1, T + 1):
        g = _tdns_g(problem, U0, e, t, R[:, t - 1], S, Q, keep)
        e = g @ Wg + b
        out[:, t - 1] = U0[:, t] + e
    return out
