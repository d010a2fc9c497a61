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
    """Exactly minimizing the BPX objective reproduces the raw-system ground
    truth: w* = lstsq(G^T A G, G^T(f - A u_bc)) -> unmap == direct solve,
    INCLUDING exact BC values (imposed by the lift, not learned); and the
    problem's jitted loss at w* is ~0."""
    p = bpx_problem
    batch = p.sample_batch(jax.random.PRNGKey(0), 3)
    G = p.bpx64.G.toarray()
    ubc = p.bpx64.u_bc
    A = np.asarray(p.A64, dtype=np.float64)
    f = np.asarray(batch["load"], dtype=np.float64)
    Ah = G.T @ A @ G
    rhs = (f - A @ ubc) @ G  # (B, m)
    w = np.linalg.lstsq(Ah, rhs.T, rcond=1e-10)[0].T  # (B, m)
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
    # loss at the optimum ~ 0 relative to loss at a random w
    l_star = float(p.loss(jnp.asarray(w, dtype=jnp.float32), batch))
    l_rand = float(p.loss(
        jax.random.normal(jax.random.PRNGKey(7), w.shape, dtype=jnp.float32),
        batch,
    ))
    assert l_star < 1e-6 * l_rand, (l_star, l_rand)


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


def test_sparse_newton_matches_dense():
    """newton_solve_ns_sparse (SuperLU, 50k-scale path) solves the identical
    group-FEM system as the dense Newton."""
    from feonet_navier_stokes_tpu.fem import (
        apply_bc_matrix, apply_bc_vector, assemble_convection,
        assemble_load_sincos,
    )
    from feonet_navier_stokes_tpu.linalg import newton_solve_ns
    from feonet_navier_stokes_tpu.linalg.newton import newton_solve_ns_sparse
    from feonet_navier_stokes_tpu.sampling import sample_sincos_coeffs

    sp = build_taylor_hood(structured_rectangle(4, 4))
    bc = make_bc(sp, square_bcs("lower"))
    mask = np.asarray(bc.mask)
    A = apply_bc_matrix(np.asarray(assemble_stokes(sp, mu=0.1)), mask)
    B1, B2 = assemble_convection(sp)
    B1, B2 = np.asarray(B1), np.asarray(B2)
    coeffs = sample_sincos_coeffs(jax.random.PRNGKey(2), 1)
    load = np.asarray(assemble_load_sincos(sp, np.asarray(coeffs, np.float64)))[0]
    load = apply_bc_vector(load, mask, np.asarray(bc.values))

    u_d, rel_d, _ = newton_solve_ns(A, B1, B2, load, sp.n2, conv_row_mask=mask)
    u_s, rel_s, _ = newton_solve_ns_sparse(
        csr_matrix(A), csr_matrix(B1), csr_matrix(B2), load, sp.n2,
        conv_row_mask=mask,
    )
    assert rel_d < 1e-10 and rel_s < 1e-10, (rel_d, rel_s)
    np.testing.assert_allclose(u_s, u_d, rtol=1e-8, atol=1e-10)


def test_bpx_ns_loss_zero_at_newton_solution():
    """steady_ns + bpx_levels: the projected nonlinear residual vanishes at
    the Newton solution (in exact w-preimage coordinates)."""
    p = build_problem(
        ProblemConfig(name="steady_ns", bc="lower", nx=4, bpx_levels=2)
    )
    batch, truth = p.sample_converged(jax.random.PRNGKey(2), 1)
    # w-preimage of the free part of the Newton solution: G w = u - u_bc
    G = p.bpx64.G.toarray()
    w = np.linalg.lstsq(G, (truth - p.bpx64.u_bc).T, rcond=None)[0].T
    np.testing.assert_allclose(G @ w[0], truth[0] - p.bpx64.u_bc, atol=1e-8)
    l_star = float(p.loss(jnp.asarray(w, dtype=jnp.float32), batch))
    l_rand = float(p.loss(
        jax.random.normal(jax.random.PRNGKey(3), w.shape, dtype=jnp.float32), batch,
    ))
    assert l_star < 1e-6 * l_rand, (l_star, l_rand)


def test_bpx_ns_training_smoke():
    tc = TrainConfig(
        model="FCNN", lr=2e-3, epochs=200, num_train=8, num_val=4,
        eval_every=100, data_parallel=False,
        model_kwargs={"hidden_dims": (32,)},
    )
    p = build_problem(
        ProblemConfig(name="steady_ns", bc="lower", nx=4, bpx_levels=2)
    )
    tr = Trainer(p, tc)
    train_ds, val_ds = tr.make_datasets()
    hist = tr.fit(train_ds, val_ds, verbose=False)
    # fit may append a track_best restore record (no 'loss'/'coeff' keys)
    # as the final history entry — read the last EVAL records
    losses = [h["loss"] for h in hist if "loss" in h]
    coeffs = [h["coeff"] for h in hist if "coeff" in h]
    assert losses[-1] < losses[0]
    assert np.isfinite(coeffs[-1])


def test_bpx_data_parallel_matches_single_device(bpx_problem):
    """BPX composes with the data mesh: the 8-device sharded step equals the
    single-device step (the w-space loss reduces with the same psum)."""
    assert len(jax.devices()) == 8
    from feonet_navier_stokes_tpu.parallel import shard_batch

    tc_kw = dict(
        model="FCNN", lr=1e-3, epochs=1, num_train=16, num_val=4,
        model_kwargs={"hidden_dims": (8,)}, seed=3,
    )
    tr1 = Trainer(bpx_problem, TrainConfig(data_parallel=False, **tc_kw))
    tr8 = Trainer(bpx_problem, TrainConfig(data_parallel=True, **tc_kw))
    batch = bpx_problem.sample_batch(jax.random.PRNGKey(9), 16)
    rng = jax.random.PRNGKey(4)
    out = {}
    for name, tr, b in (
        ("single", tr1, batch),
        ("sharded", tr8, shard_batch(batch, tr8.mesh)),
    ):
        state = tr.state
        for _ in range(2):
            state, loss = tr._train_step(state, b, rng, tr.ops)
        out[name] = (float(loss), jax.device_get(state.params))
    np.testing.assert_allclose(out["sharded"][0], out["single"][0], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(out["single"][1]),
                    jax.tree.leaves(out["sharded"][1])):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


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
