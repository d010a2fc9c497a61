"""BPX-congruence conditioning (linalg/bpx.py + ProblemConfig.bpx_levels).

The label-free residual objective at large ng is bound by cond(A); the BPX
congruence G^T A G w = G^T(f - A u_bc) has O(1)-in-h effective conditioning
(measured 16.2 / 21.4 at ng=659 / 2467 vs raw 292 / 1139). No reference
counterpart — its dense SPAI (train_FEONet.py:104-143) cannot scale past
ng~2.5k; this is the scalable TPU-native replacement (SURVEY.md §7 step 7).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.sparse import csr_matrix

from feonet_navier_stokes_tpu.fem import assemble_stokes, make_bc
from feonet_navier_stokes_tpu.fem.bcs import square_bcs
from feonet_navier_stokes_tpu.geometry import (
    build_taylor_hood,
    structured_rectangle,
)
from feonet_navier_stokes_tpu.linalg import bpx_factor, p2_interpolation
from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
from feonet_navier_stokes_tpu.train import Trainer, TrainConfig


def test_p2_interpolation_reproduces_quadratics():
    """Nested interpolation must be EXACT on P2 functions: evaluating a
    coarse-space quadratic at fine nodes equals interpolating its coarse
    coefficients."""
    sp_c = build_taylor_hood(structured_rectangle(4, 4))
    sp_f = build_taylor_hood(structured_rectangle(8, 8))
    P = p2_interpolation(sp_c, 4, sp_f)

    def q(x, y):  # a full quadratic — exactly representable in P2
        return 1.0 + 2 * x - 3 * y + 0.5 * x * y + x**2 - 0.25 * y**2

    coarse_vals = q(sp_c.p2_coords[:, 0], sp_c.p2_coords[:, 1])
    fine_vals = q(sp_f.p2_coords[:, 0], sp_f.p2_coords[:, 1])
    np.testing.assert_allclose(P @ coarse_vals, fine_vals, atol=1e-12)


def test_bpx_effective_cond_pin():
    """eff-cond(G^T A G) == 16.19 at nx=8 channel_flow (vs raw cond 292)."""
    sp = build_taylor_hood(structured_rectangle(8, 8))
    bc = make_bc(sp, square_bcs("channel_flow"))
    A_raw = csr_matrix(assemble_stokes(sp, mu=0.1, fmt="csr"))
    fac = bpx_factor(sp, 8, bc.mask, bc.values, "channel_flow", 0.1, levels=3)
    Ah = (fac.G.T @ A_raw @ fac.G).toarray()
    s = np.sort(np.linalg.svd(Ah, compute_uv=False))[::-1]
    nfree = int((np.asarray(bc.mask) == 0).sum())
    eff = s[0] / s[nfree - 1]
    assert eff < 20.0, eff
    np.testing.assert_allclose(eff, 16.19, rtol=0.05)
    # rank: exactly nfree nonzero singular values (null(A_hat) = null(G))
    assert s[nfree] < 1e-10 * s[0]


@pytest.fixture(scope="module")
def bpx_problem():
    return build_problem(
        ProblemConfig(name="stokes_square", bc="channel_flow", nx=8,
                      bpx_levels=3)
    )


def test_bpx_solve_matches_ground_truth(bpx_problem):
    """Exactly minimizing the BPX residual reproduces the raw-system ground
    truth: lstsq(A_hat, f_hat) -> unmap == direct solve of A u = f,
    INCLUDING exact BC values (imposed by the lift, not learned)."""
    p = bpx_problem
    batch = p.sample_batch(jax.random.PRNGKey(0), 3)
    Ah = np.asarray(p.op_train, dtype=np.float64)
    fh = np.asarray(batch["load"], dtype=np.float64)
    w = np.linalg.lstsq(Ah, fh.T, rcond=1e-10)[0].T  # (B, m)
    u = np.asarray(p.unmap(jnp.asarray(w, dtype=jnp.float32)), dtype=np.float64)
    truth = p.ground_truth(batch)
    err = np.linalg.norm(u - truth, axis=1) / np.linalg.norm(truth, axis=1)
    assert (err < 5e-5).all(), err  # f32 G application bounds the round-trip
    # BC rows exact (up to f32): channel pressure 8/0, wall no-slip
    mask = np.asarray(p.bc.mask) > 0.5
    np.testing.assert_allclose(
        u[:, mask], np.broadcast_to(np.asarray(p.bc.values)[mask], u[:, mask].shape),
        atol=1e-5,
    )


def test_bpx_residual_training_beats_raw(bpx_problem):
    """Same model/budget, label-free residual training: the BPX-conditioned
    objective converges far past the raw one (the entire point)."""
    results = {}
    for name, prob in (
        ("bpx", bpx_problem),
        ("raw", build_problem(
            ProblemConfig(name="stokes_square", bc="channel_flow", nx=8))),
    ):
        tc = TrainConfig(
            model="FCNN", lr=2e-3, epochs=800, num_train=32, num_val=16,
            eval_every=400, data_parallel=False,
            model_kwargs={"hidden_dims": (64,)},
        )
        tr = Trainer(prob, tc)
        train_ds, val_ds = tr.make_datasets()
        hist = tr.fit(train_ds, val_ds, verbose=False)
        results[name] = hist[-1]["coeff"]
    assert results["bpx"] < 0.5 * results["raw"], results


def test_bpx_bsr_matches_dense(bpx_problem):
    """op_format='bsr' builds the SAME A_hat/G (Pallas tiles vs dense)."""
    p_bsr = build_problem(
        ProblemConfig(name="stokes_square", bc="channel_flow", nx=8,
                      bpx_levels=3, op_format="bsr")
    )
    batch = bpx_problem.sample_batch(jax.random.PRNGKey(1), 4)
    w = jax.random.normal(jax.random.PRNGKey(2), (4, bpx_problem.d_out),
                          dtype=jnp.float32)
    l_dense = float(bpx_problem.loss(w, batch))
    l_bsr = float(p_bsr.loss(w, batch))
    np.testing.assert_allclose(l_bsr, l_dense, rtol=2e-5)
    u_dense = np.asarray(bpx_problem.unmap(w))
    u_bsr = np.asarray(p_bsr.unmap(w))
    np.testing.assert_allclose(u_bsr, u_dense, rtol=2e-5, atol=2e-5)
