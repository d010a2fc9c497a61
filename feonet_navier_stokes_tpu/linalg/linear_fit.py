"""Closed-form (global) solution of the residual objective for LinearMap.

For the LINEAR steady problems the label-free residual objective restricted
to the LinearMap model class (models/steady.py) is a convex quadratic in the
parameters: with an exact right preconditioner the per-sample optimum output
solves ``op_train w = load``, so the optimal affine map is one least-squares
solve over a feature matrix of model inputs. This module computes that
optimum directly on host float64 — the same label-free information the
gradient path uses (loads + assembled operator; reference solutions are
never touched), minimized exactly instead of by 60k Adam steps.

No reference counterpart: the reference (FEONet_Stokes_square/
train_FEONet.py:259-301) only ever optimizes its residual objective with
SGD-family steps, never exploiting that for its two Stokes problems the
objective is quadratic.
"""

from __future__ import annotations

from typing import Any

import numpy as np

__all__ = [
    "linear_map_lstsq",
    "set_linear_map_params",
    "linear_step_exact",
    "set_linear_step_params",
    "defect_linear_fit",
    "apply_defect_fit",
    "defect_step_fit",
    "apply_defect_step_fit",
]


def _features(problem, batch) -> np.ndarray:
    x = np.asarray(problem.model_input(batch, "LinearMap"), dtype=np.float64)
    x = x.reshape(x.shape[0], -1)
    return np.concatenate([x, np.ones((x.shape[0], 1))], axis=1)


def linear_map_lstsq(
    problem,
    num_train: int = 6000,
    ridge: float = 0.0,
    seed: int = 5,
) -> dict[str, Any]:
    """Fit the optimal LinearMap for a steady linear problem.

    Returns {'kernel': (d_in, d_out) f32, 'bias': (d_out,) f32,
    'train_fit_rms': float} with kernel/bias in the flax Dense layout.
    """
    import jax

    c = problem.config
    if c.name not in ("stokes_square", "stokes_hole"):
        raise ValueError(
            "linear_map_lstsq requires a linear steady problem "
            f"(stokes_square / stokes_hole), got {c.name!r}"
        )
    ops = problem.device_ops
    op = np.asarray(ops["op_train"], dtype=np.float64)
    if op.ndim != 2:
        raise ValueError("linear_map_lstsq needs a dense op_train "
                         "(use precond_mode='exact' or dense op_format)")

    batch = problem.sample_batch(jax.random.PRNGKey(seed), num_train)
    X = _features(problem, batch)
    L = np.asarray(batch["load"], dtype=np.float64)
    T = np.linalg.solve(op, L.T).T  # optimal per-sample output (training coords)

    if ridge > 0:
        A = X.T @ X + ridge * np.eye(X.shape[1])
        W = np.linalg.solve(A, X.T @ T)
    else:
        W, *_ = np.linalg.lstsq(X, T, rcond=None)
    fit_rms = float(np.sqrt(np.mean((X @ W - T) ** 2)))
    return {
        "kernel": np.asarray(W[:-1], dtype=np.float32),
        "bias": np.asarray(W[-1], dtype=np.float32),
        "train_fit_rms": fit_rms,
    }


def linear_step_exact(problem) -> dict[str, Any]:
    """Exact LinearStep parameters for timedep_stokes (training coords).

    The rollout residual (residual/losses.py:rollout_residual) vanishes
    identically at

        w_t = sys^{-1} [ S_dr (dc ∘ (M w_{t-1})) + dt f_dr ]

    with sys = (dr (S+dt·A) dc) M. For precond_mode='exact' sys == I, so the
    zero-residual recursion is itself the affine map LinearStep represents:

        W_step = S_dr diag(dc) M,   b_step = dt f_dr,
        W_in   = dr ∘ (S + dt·A)    (maps the physical IC u0 to the h0 with
                                     dc ∘ (M h0) = u0, making step(h0) the
                                     correct first step)

    — i.e. the exact discrete propagator expressed in the model class,
    computed from the assembled operators only (label-free). This is the
    global optimum the queued LinearStep training runs approach by Adam.
    """
    c = problem.config
    if c.name != "timedep_stokes":
        raise ValueError(f"linear_step_exact requires timedep_stokes, got {c.name!r}")
    if problem.precond64 is None or c.precond_mode != "exact":
        raise ValueError("linear_step_exact requires precond_mode='exact'")
    S64 = problem.S64
    A64 = problem.A64
    if hasattr(S64, "toarray"):
        S64 = S64.toarray()
    if hasattr(A64, "toarray"):
        A64 = A64.toarray()
    n = S64.shape[0]
    if problem.equil64 is not None:
        dr, dc = problem.equil64
    else:
        dr = dc = np.ones(n)
    M = np.asarray(problem.precond64, dtype=np.float64)
    S_dr = dr[:, None] * np.asarray(S64, dtype=np.float64)
    W_step = S_dr @ (dc[:, None] * M)
    b_step = c.dt * dr * np.asarray(problem.load_const64, dtype=np.float64)
    W_in = dr[:, None] * (np.asarray(S64, np.float64) + c.dt * np.asarray(A64, np.float64))
    return {
        "kernel_in": np.asarray(W_in.T, dtype=np.float32),
        "kernel_step": np.asarray(W_step.T, dtype=np.float32),
        "bias_step": np.asarray(b_step, dtype=np.float32),
    }


def defect_linear_fit(
    stage1_trainer,
    n_samples: int = 3000,
    ridge: float = 1e-8,
    seed: int = 9000,
    chunk: int = 512,
) -> dict[str, Any]:
    """Closed-form affine stage-2 for the timedep cascade: fit the map

        u_init  ->  e*(u_init)   (the PHYSICAL defect trajectory of the
                                  frozen stage-1, (T, ng) flattened)

    by ridge least squares over fresh draws. Rationale (measured, ne=200):
    timedep_stokes is linear, and the trained stage-1 RNN is near-linear in
    u_init, so the defect is linear to ~1.5e-7 — while a stage-2 RNN trained
    by Adam leaves the pressure component untouched (p 0.017 across
    residual/supervised objectives, runs/r4/td_sup_result.json). The labels
    are the framework's own exact defect solutions (Problem.defect_truth64:
    T back-solves on one LU factorization — no extra data generation), so
    the fit costs seconds. Inference is ONE affine map after the stage-1
    forward: no solver in the deployment path, unlike --stage2 exact.

    Normal-equation solve, output columns chunked: W is (ng+1) x (T*ng)
    (~10M params at ne=200, ~100M at T=100) — the Gram matrix is tiny
    ((ng+1)^2) but Y is large, so X^T Y is accumulated in column chunks.

    Returns {'W': (d_in+1, T*ng) f32, 'shape': (T, ng), 'fit_rel': float}.
    """
    import jax

    p = stage1_trainer.problem
    if p.config.name != "timedep_stokes":
        raise ValueError("defect_linear_fit requires timedep_stokes "
                         f"(got {p.config.name!r})")
    key = jax.random.PRNGKey(seed)
    batch = p.sample_batch(key, n_samples)
    pred0 = stage1_trainer._raw_forward(batch)
    d = p.defect_batch64(batch, pred0)
    e_star = p.defect_truth64(d)[:, 1:]  # (B, T, ng) physical
    B, T, ng = e_star.shape
    X = np.asarray(batch["u_init"], dtype=np.float64)
    X = np.concatenate([X, np.ones((B, 1))], axis=1)
    G = X.T @ X + ridge * np.eye(X.shape[1])
    import scipy.linalg as sla

    cho = sla.cho_factor(G)
    Y = e_star.reshape(B, T * ng)
    W = np.empty((X.shape[1], T * ng), dtype=np.float64)
    for j in range(0, T * ng, chunk * 128):
        sl = slice(j, min(j + chunk * 128, T * ng))
        W[:, sl] = sla.cho_solve(cho, X.T @ Y[:, sl])
    fit_rel = float(np.linalg.norm(X @ W - Y) / np.linalg.norm(Y))
    return {"W": W.astype(np.float32), "shape": (T, ng), "fit_rel": fit_rel}


def defect_step_fit(
    stage1_trainer,
    n_samples: int = 800,
    ridge: float = 0.0,
    seed: int = 9100,
) -> dict[str, Any]:
    """Closed-form LINEAR-RECURRENCE stage-2 for the timedep cascade.

    The exact defect trajectory of ANY frozen stage-1 obeys (see
    Problem.defect_truth64)

        sys · e_t = S · e_{t-1} + dt · r_t,        e_0 = 0,

    with r_t the stage-1 equation residual (a matvec of known assembled
    operators — label-free at inference). The map (e_{t-1}, r_t) -> e_t is
    therefore EXACTLY linear and shared across all samples and all steps, so
    one least-squares fit over exact-defect-labeled rows recovers it to
    floating-point precision:

        e_t = [e_{t-1} | r_t | 1] @ W,             W: (2·ng+1, ng).

    Unlike ``defect_linear_fit`` (affine in u_init, blind to the ~39% of the
    defect that is stage-1 nonlinearity), this closes the gap to the exact
    corrector: the fitted recurrence IS the discrete propagator expressed as
    a one-layer linear RNN (the LinearStep model class of
    models/temporal.py), trained in closed form instead of 60k Adam steps.
    Inference = stage-1 forward + T residual matvecs + T (ng x ng) matmuls —
    no factorization or solver in the deployment path.

    Labels come from the framework's own exact defect solves
    (Problem.defect_truth64); the reference has no counterpart — its
    time-dependent training (FEONet_time_dep_Stokes/train_FEONet.py:343-406)
    never corrects a trained model, and its accuracy floors at the network
    optimization error this construction removes.

    Returns {'W': (2·ng+1, ng) f32, 'ng': ng, 'fit_rel': float}.
    """
    import jax

    p = stage1_trainer.problem
    if p.config.name != "timedep_stokes":
        raise ValueError("defect_step_fit requires timedep_stokes "
                         f"(got {p.config.name!r})")
    key = jax.random.PRNGKey(seed)
    batch = p.sample_batch(key, n_samples)
    pred0 = stage1_trainer._raw_forward(batch)
    d = p.defect_batch64(batch, pred0)
    e = p.defect_truth64(d)  # (B, T+1, ng) physical, e_0 = 0
    r = np.asarray(d["load"], dtype=np.float64)
    if p.equil64 is not None:
        r = r / p.equil64[0]  # back to physical rows
    B, T, ng = r.shape
    n_rows = B * T
    if n_rows < 2 * ng + 1:
        raise ValueError(
            f"need n_samples*T >= 2*ng+1 rows to identify the step map "
            f"(have {n_rows}, need {2 * ng + 1})")
    X = np.concatenate(
        [e[:, :-1].reshape(n_rows, ng), r.reshape(n_rows, ng),
         np.ones((n_rows, 1))], axis=1)
    Y = e[:, 1:].reshape(n_rows, ng)
    if ridge > 0:
        G = X.T @ X + ridge * np.eye(X.shape[1])
        W = np.linalg.solve(G, X.T @ Y)
    else:
        W, *_ = np.linalg.lstsq(X, Y, rcond=None)
    fit_rel = float(np.linalg.norm(X @ W - Y) / np.linalg.norm(Y))
    return {"W": W.astype(np.float32), "ng": ng, "fit_rel": fit_rel}


def apply_defect_step_fit(
    fit: dict[str, Any], problem, defect_batch: dict[str, Any]
) -> np.ndarray:
    """Roll out the fitted stage-2 recurrence (float32 inference, like any
    deployed head): defect_batch['load'] -> (B, T, ng) physical correction."""
    r = np.asarray(defect_batch["load"], dtype=np.float32)
    if problem.equil64 is not None:
        r = r / problem.equil64[0].astype(np.float32)
    B, T, ng = r.shape
    W = fit["W"]
    out = np.empty((B, T, ng), dtype=np.float32)
    e = np.zeros((B, ng), dtype=np.float32)
    ones = np.ones((B, 1), dtype=np.float32)
    for t in range(T):
        e = np.concatenate([e, r[:, t], ones], axis=1) @ W
        out[:, t] = e
    return out


def apply_defect_fit(fit: dict[str, Any], u_init) -> np.ndarray:
    """Evaluate the affine stage-2: (B, d_in) u_init -> (B, T, ng) physical
    correction (float32 inference, like any deployed head)."""
    X = np.asarray(u_init, dtype=np.float32)
    X = np.concatenate([X, np.ones((X.shape[0], 1), np.float32)], axis=1)
    T, ng = fit["shape"]
    return (X @ fit["W"]).reshape(X.shape[0], T, ng)


def set_linear_step_params(trainer, fit: dict[str, Any]) -> None:
    """Install a linear_step_exact solution into a Trainer built with
    model='LinearStep' (params AND the EMA copy, if any)."""
    import jax.numpy as jnp

    if trainer.config.model != "LinearStep":
        raise ValueError("trainer must be built with model='LinearStep'")

    def install(params):
        p = dict(params)
        d_in = dict(p["Dense_0"])
        d_in["kernel"] = jnp.asarray(fit["kernel_in"])
        d_in["bias"] = jnp.zeros_like(d_in["bias"])
        p["Dense_0"] = d_in
        scan = dict(p["Scan_AffineStep_0"])
        d_st = dict(scan["Dense_0"])
        d_st["kernel"] = jnp.asarray(fit["kernel_step"])
        d_st["bias"] = jnp.asarray(fit["bias_step"])
        scan["Dense_0"] = d_st
        p["Scan_AffineStep_0"] = scan
        return p

    state = trainer.state
    trainer.state = state.replace(
        params=install(state.params),
        ema_params=(install(state.ema_params)
                    if state.ema_params is not None else None),
    )


def set_linear_map_params(trainer, fit: dict[str, Any]) -> None:
    """Install a linear_map_lstsq solution into a Trainer built with
    model='LinearMap' (params AND the EMA copy, if any)."""
    import jax.numpy as jnp

    if trainer.config.model != "LinearMap":
        raise ValueError("trainer must be built with model='LinearMap'")

    def install(params):
        p = dict(params)
        d = dict(p["Dense_0"])
        if d["kernel"].shape != fit["kernel"].shape:
            raise ValueError(
                f"kernel shape {fit['kernel'].shape} != model "
                f"{d['kernel'].shape} (resol_in/d_out mismatch?)"
            )
        d["kernel"] = jnp.asarray(fit["kernel"])
        d["bias"] = jnp.asarray(fit["bias"])
        p["Dense_0"] = d
        return p

    state = trainer.state
    trainer.state = state.replace(
        params=install(state.params),
        ema_params=(install(state.ema_params)
                    if state.ema_params is not None else None),
    )
