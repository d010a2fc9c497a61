"""Algebraic (smoothed-aggregation) BPX for the unstructured hole domain
(VERDICT item 6: the label-free large-ng path the reference's open problem
lacks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem


@pytest.fixture(scope="module")
def hole_bpx_problem():
    return build_problem(
        ProblemConfig(name="stokes_hole", bc="channel_flow", forcing="grf",
                      hole_h=0.25, resol_in=16, bpx_levels=3)
    )


def test_hole_bpx_effcond(hole_bpx_problem):
    """eff-cond(G^T A G) beats the raw system by a large factor (measured at
    reference scale ne=512: 134 vs 1943; pinned loosely at the small mesh)."""
    p = hole_bpx_problem
    G = p.bpx64.G.toarray()
    A = p.A64
    n_free = int((np.asarray(p.bc.mask) == 0).sum())
    s_raw = np.linalg.svd(A, compute_uv=False)
    s = np.linalg.svd(G.T @ A @ G, compute_uv=False)
    eff = s[0] / s[n_free - 1]
    raw = s_raw[0] / s_raw[-1]
    assert eff < raw / 3.0, (eff, raw)
    assert np.isfinite(eff)


def test_hole_bpx_exact_w_solution_recovers_truth(hole_bpx_problem):
    """Solving the w-space Gauss-Newton system exactly and unmapping
    (u = G w + u_bc) reproduces the raw-system ground truth — BCs exact."""
    p = hole_bpx_problem
    G = p.bpx64.G.toarray()
    b = p.sample_batch(jax.random.PRNGKey(0), 2)
    truth = p.ground_truth(b)
    load = p.load64(b)
    # min_w ||A(Gw + ubc) - f||: normal equations with M = A G
    M = p.A64 @ G
    rhs = load - p.bpx64.u_bc @ p.A64.T
    w, *_ = np.linalg.lstsq(M, rhs.T, rcond=None)
    u = (G @ w).T + p.bpx64.u_bc
    np.testing.assert_allclose(u, truth, rtol=1e-6, atol=1e-8)
    # device plumbing: unmap maps w -> u
    u_dev = np.asarray(p.unmap(jnp.asarray(w.T, jnp.float32)))
    np.testing.assert_allclose(u_dev, truth, rtol=1e-3, atol=1e-4)


def test_hole_bpx_training_runs(hole_bpx_problem):
    """Label-free training on the hole domain with the algebraic congruence:
    loss decreases, head emits d_out = m."""
    from feonet_navier_stokes_tpu.train import Trainer, TrainConfig

    p = hole_bpx_problem
    assert p.d_out == p.bpx64.m
    tc = TrainConfig(
        model="Net2D", lr=1e-3, epochs=80, num_train=8, num_val=4,
        eval_every=40, data_parallel=False, model_kwargs={"filters": 4},
    )
    tr = Trainer(p, tc)
    train_ds, val_ds = tr.make_datasets()
    hist = tr.fit(train_ds, val_ds, verbose=False)
    assert hist[-1]["loss"] < hist[0]["loss"]
    assert np.isfinite(hist[-1]["coeff"])


def test_amg_theta_omega_knobs(hole_bpx_problem):
    """ProblemConfig.amg_theta/amg_omega reach the SA hierarchy: a much
    stricter strength threshold changes the aggregates (and so the factor),
    while the default matches the module fixture's."""
    p_default = hole_bpx_problem
    p_tuned = build_problem(
        ProblemConfig(name="stokes_hole", bc="channel_flow", forcing="grf",
                      hole_h=0.25, resol_in=16, bpx_levels=3,
                      amg_theta=0.5, amg_omega=0.5)
    )
    G0, G1 = p_default.bpx64.G, p_tuned.bpx64.G
    assert G0.shape[0] == G1.shape[0]  # same fine space
    # theta=0.5 drops most strength edges -> different aggregation -> the
    # congruence factor has a different column count or different entries
    assert (G0.shape[1] != G1.shape[1]
            or np.abs(G0 - G1).max() > 1e-12)
