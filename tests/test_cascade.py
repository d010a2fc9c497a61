"""Residual cascade (stage-2 defect training): exactness identities.

The defect batch (Problem.defect_batch64) must satisfy: the exact correction
e* = (training-coordinate truth) - u0 zeroes the stage-2 loss, for every
conditioning mode — because the stage-2 system is the exact (linear or
quadratic) expansion of the original residual about the frozen stage-1
state u0."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem


def _uhat_truth(p, batch, truth64):
    """Map physical truth into the training coordinates (u = dc ∘ (M û))."""
    if p.bpx64 is not None:
        G = p.bpx64.G.toarray()
        w, *_ = np.linalg.lstsq(G, (truth64 - p.bpx64.u_bc).T, rcond=None)
        return w.T
    u = truth64
    if p.equil64 is not None:
        u = u / p.equil64[1]
    if p.precond64 is not None:
        u = np.linalg.solve(p.precond64, u.T).T
    return u


@pytest.mark.parametrize("kw", [
    {},
    {"equilibrate": True},
    {"precond_iters": 300},
    {"equilibrate": True, "precond_iters": 300},
    {"equilibrate": True, "precond_mode": "exact"},
    {"bpx_levels": 2},
])
def test_linear_cascade_exact_correction(kw):
    p = build_problem(ProblemConfig(name="stokes_square", bc="lower", nx=4, **kw))
    rng = np.random.default_rng(0)
    batch = p.sample_batch(jax.random.PRNGKey(1), 3)
    truth = p.ground_truth(batch)
    u0 = jnp.asarray(rng.standard_normal((3, p.d_out)) * 0.1, jnp.float32)
    b2 = p.defect_batch64(batch, u0)
    ustar = _uhat_truth(p, batch, truth)
    estar = jnp.asarray(ustar - np.asarray(u0, np.float64), jnp.float32)
    ops = p.device_ops
    if p.bpx64 is not None:
        ops = {**ops, "bpx_ubc": jnp.zeros_like(ops["bpx_ubc"])}
    loss = float(p.loss(estar, b2, ops))
    loss_bad = float(p.loss(estar * 1.02 + 0.01, b2, ops))
    assert loss < 1e-4 * loss_bad, (kw, loss, loss_bad)


@pytest.mark.parametrize("equil", [False, True])
def test_ns_cascade_exact_correction(equil):
    p = build_problem(ProblemConfig(name="steady_ns", bc="lower", nx=4,
                                    ns_truth="group", equilibrate=equil))
    # sample_converged filters non-converged Newton draws (a raw draw at this
    # size can stall at rel ~1e-2, which is a truth error, not a loss error)
    batch, us = p.sample_converged(jax.random.PRNGKey(2), 2)
    rng = np.random.default_rng(3)
    u0 = jnp.asarray(rng.standard_normal((2, p.d_out)) * 0.1, jnp.float32)
    b2 = p.defect_batch64(batch, u0)
    ustar = us / p.equil64[1] if equil else us
    estar = jnp.asarray(ustar - np.asarray(u0, np.float64), jnp.float32)
    loss = float(p.loss(estar, b2))
    loss_bad = float(p.loss(estar * 1.02 + 0.01, b2))
    assert loss < 1e-4 * loss_bad, (equil, loss, loss_bad)


@pytest.mark.parametrize("kw", [
    {}, {"equilibrate": True}, {"precond_iters": 200},
    {"equilibrate": True, "precond_iters": 200},
    {"equilibrate": True, "precond_mode": "exact"},
])
def test_timedep_cascade_exact_correction(kw):
    p = build_problem(ProblemConfig(name="timedep_stokes", bc="lower", nx=4,
                                    forcing="five", seq_len=4, **kw))
    batch = p.sample_batch(jax.random.PRNGKey(4), 2)
    traj = p.ground_truth(batch, n_steps=4)[:, 1:]  # (B, T, ng)
    rng = np.random.default_rng(5)
    u0 = jnp.asarray(rng.standard_normal(traj.shape) * 0.1, jnp.float32)
    b2 = p.defect_batch64(batch, u0)
    flat = traj.reshape(-1, p.ng)
    ustar = _uhat_truth(p, batch, flat).reshape(traj.shape)
    estar = jnp.asarray(ustar - np.asarray(u0, np.float64), jnp.float32)
    loss = float(p.loss(estar, b2))
    loss_bad = float(p.loss(estar * 1.02 + 0.01, b2))
    assert loss < 1e-4 * loss_bad, (kw, loss, loss_bad)


@pytest.mark.parametrize("kw", [{}, {"equilibrate": True}])
def test_timedep_ns_cascade_exact_correction(kw):
    """Semi-implicit NS rollout cascade: the exact correction zeroes the
    stage-2 loss (lagged-convection quadratic expansion is exact)."""
    p = build_problem(ProblemConfig(name="timedep_ns", bc="lower", nx=4,
                                    forcing="five", seq_len=4, **kw))
    batch = p.sample_batch(jax.random.PRNGKey(6), 2)
    traj = p.ground_truth(batch, n_steps=4)[:, 1:]
    rng = np.random.default_rng(7)
    u0 = jnp.asarray(rng.standard_normal(traj.shape) * 0.1, jnp.float32)
    b2 = p.defect_batch64(batch, u0)
    flat = traj.reshape(-1, p.ng)
    ustar = _uhat_truth(p, batch, flat).reshape(traj.shape)
    estar = jnp.asarray(ustar - np.asarray(u0, np.float64), jnp.float32)
    loss = float(p.loss(estar, b2))
    loss_bad = float(p.loss(estar * 1.02 + 0.01, b2))
    assert loss < 1e-4 * loss_bad, (kw, loss, loss_bad)


def test_cascade_stage2_never_resamples():
    """Regression: Trainer.cascade must pin resample_every=0 in the stage-2
    config — a resampled batch is a fresh ORIGINAL-problem draw, not a defect
    batch, so stage 2 silently stops learning the correction (observed as
    cascade-combined rel-L2 ~1.0 while the stage-2 loss itself descends)."""
    from feonet_navier_stokes_tpu.train import Dataset, Trainer, TrainConfig

    p = build_problem(ProblemConfig(name="timedep_stokes", bc="lower", nx=4,
                                    forcing="five", seq_len=3,
                                    equilibrate=True, precond_mode="exact"))
    tc = TrainConfig(model="RNN", model_kwargs={"hidden": 8}, epochs=4,
                     eval_every=4, loss_mode="residual", truth_for_train=False,
                     resample_every=2, lr=1e-3)
    tr = Trainer(p, tc)
    batch = p.sample_batch(jax.random.PRNGKey(0), 2)
    truth = p.ground_truth(batch, n_steps=3)
    tr.cascade(Dataset(batch, None), Dataset(batch, truth), epochs=4)
    assert tr.stage2.config.resample_every == 0


def test_defect_truth64_exactness():
    """defect_truth64 must return the EXACT physical correction: stage-1 +
    e* reproduces the f64 ground-truth trajectory to f32-rollout accuracy,
    and e* zeroes the stage-2 rollout loss (mapped to training coords)."""
    from feonet_navier_stokes_tpu.train.metrics import trajectory_rel_l2

    p = build_problem(ProblemConfig(name="timedep_stokes", bc="lower", nx=4,
                                    forcing="five", seq_len=5,
                                    equilibrate=True, precond_mode="exact"))
    batch = p.sample_batch(jax.random.PRNGKey(3), 3)
    truth = p.ground_truth(batch, n_steps=5)  # (B, T+1, ng) physical f64
    rng = np.random.default_rng(11)
    pred0 = jnp.asarray(rng.standard_normal((3, 5, p.d_out)) * 0.1,
                        jnp.float32)
    d = p.defect_batch64(batch, pred0)
    e_star = p.defect_truth64(d)  # (B, T+1, ng) physical, e*_0 = 0
    assert e_star.shape == (3, 6, p.ng)
    assert np.all(e_star[:, 0] == 0.0)
    combined = np.asarray(p.unmap(pred0)) + e_star[:, 1:]
    err = float(trajectory_rel_l2(combined, truth[:, 1:]))
    assert err < 1e-5, err


def test_defect_step_fit_recovers_propagator():
    """defect_step_fit must identify the discrete defect propagator from
    exact-defect-labeled rows: the fit is near machine precision, and the
    rolled-out f32 recurrence corrects an UNTRAINED stage-1 to f32-rollout
    accuracy (the closed-form LinearStep stage-2)."""
    from feonet_navier_stokes_tpu.linalg.linear_fit import (
        apply_defect_step_fit, defect_step_fit)
    from feonet_navier_stokes_tpu.train import Trainer, TrainConfig
    from feonet_navier_stokes_tpu.train.metrics import trajectory_rel_l2

    p = build_problem(ProblemConfig(name="timedep_stokes", bc="lower", nx=4,
                                    forcing="five", seq_len=5,
                                    equilibrate=True, precond_mode="exact"))
    tc = TrainConfig(model="RNN", model_kwargs={"hidden": 8}, epochs=1,
                     loss_mode="residual", truth_for_train=False)
    tr = Trainer(p, tc)
    n_fit = (2 * p.ng + 1) // 5 + 20  # rows = n*T must exceed 2*ng+1
    fit = defect_step_fit(tr, n_samples=n_fit)
    assert fit["fit_rel"] < 1e-5, fit["fit_rel"]

    batch = p.sample_batch(jax.random.PRNGKey(8), 3)
    truth = p.ground_truth(batch, n_steps=5)
    pred0 = tr._raw_forward(batch)
    d = p.defect_batch64(batch, pred0)
    corr = apply_defect_step_fit(fit, p, d)
    combined = np.asarray(p.unmap(pred0)) + corr
    err = float(trajectory_rel_l2(combined, truth[:, 1:]))
    assert err < 1e-4, err


def test_cascade_supervised_mode():
    """cascade_loss_mode='supervised' builds a labeled stage-2 dataset and
    trains on the physical-MSE objective (p-weight aware)."""
    from feonet_navier_stokes_tpu.train import Dataset, Trainer, TrainConfig

    p = build_problem(ProblemConfig(name="timedep_stokes", bc="lower", nx=4,
                                    forcing="five", seq_len=3,
                                    equilibrate=True, precond_mode="exact",
                                    p_weight=4.0))
    tc = TrainConfig(model="RNN", model_kwargs={"hidden": 8}, epochs=4,
                     eval_every=4, loss_mode="residual", truth_for_train=False,
                     resample_every=2, cascade_loss_mode="supervised", lr=1e-3)
    tr = Trainer(p, tc)
    batch = p.sample_batch(jax.random.PRNGKey(0), 2)
    truth = p.ground_truth(batch, n_steps=3)
    rec = tr.cascade(Dataset(batch, None), Dataset(batch, truth), epochs=4)
    assert tr.stage2.config.loss_mode == "supervised"
    # chunked stage 2 disables cross-chunk best-tracking/divergence guard
    assert tr.stage2.config.track_best is False
    assert tr.stage2.config.divergence_factor == 0.0
    assert "traj_rel_l2" in rec
