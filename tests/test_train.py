"""Trainer: loss decreases, eval metrics, checkpoint round-trip, sharding."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
from feonet_navier_stokes_tpu.train import Trainer, TrainConfig
from feonet_navier_stokes_tpu.train.metrics import rel_l2_error, component_errors


@pytest.fixture(scope="module")
def small_square():
    return build_problem(ProblemConfig(name="stokes_square", bc="lower", nx=4))


def test_metrics():
    pred = jnp.asarray([[1.0, 0.0], [0.0, 2.0]])
    true = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    e = np.asarray(rel_l2_error(pred, true))
    np.testing.assert_allclose(e, [0.0, 1.0])
    errs = component_errors(pred, true, n2=0)
    assert set(errs) == {"u1", "u2", "p", "coeff"}


def test_training_reduces_loss(small_square):
    tc = TrainConfig(
        model="Net2D", lr=2e-3, epochs=60, num_train=16, num_val=8,
        eval_every=30, model_kwargs={"filters": 4}, data_parallel=True,
    )
    tr = Trainer(small_square, tc)
    train_ds, val_ds = tr.make_datasets()
    hist = tr.fit(train_ds, val_ds, verbose=False)
    assert hist[-1]["loss"] < hist[0]["loss"] * 0.8
    assert np.isfinite(hist[-1]["coeff"])


def test_data_parallel_matches_single_device(small_square):
    """The DP correctness property: the 8-device sharded train step produces
    the SAME loss and updated params as the single-device step (same seed,
    same batch) — XLA's psum over 'data' must be numerically equivalent to
    the unsharded reduction (up to f32 reassociation)."""
    assert len(jax.devices()) == 8
    tc_kw = dict(
        model="FCNN", lr=1e-3, epochs=1, num_train=32, num_val=8,
        eval_every=1, model_kwargs={"hidden_dims": (8, 8)}, seed=7,
    )
    tr1 = Trainer(small_square, TrainConfig(data_parallel=False, **tc_kw))
    tr8 = Trainer(small_square, TrainConfig(data_parallel=True, **tc_kw))
    assert tr1.mesh is None and tr8.mesh is not None

    batch = small_square.sample_batch(jax.random.PRNGKey(42), 32)
    from feonet_navier_stokes_tpu.parallel import shard_batch

    rng = jax.random.PRNGKey(3)
    losses = {}
    states = {}
    for name, tr, b in (
        ("single", tr1, batch),
        ("sharded", tr8, shard_batch(batch, tr8.mesh)),
    ):
        state = tr.state
        for _ in range(3):
            state, loss = tr._train_step(state, b, rng, tr.ops)
        losses[name] = float(loss)
        states[name] = jax.device_get(state.params)

    np.testing.assert_allclose(losses["sharded"], losses["single"], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(states["single"]), jax.tree.leaves(states["sharded"])):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


def test_training_on_8_device_mesh(small_square):
    """End-to-end fit() over the virtual 8-CPU mesh stays finite (and pads a
    batch size not divisible by the device count)."""
    tc = TrainConfig(
        model="FCNN", lr=1e-3, epochs=20, num_train=30, num_val=8,
        eval_every=10, model_kwargs={"hidden_dims": (8, 8)},
    )
    tr = Trainer(small_square, tc)
    assert tr.mesh is not None
    train_ds, val_ds = tr.make_datasets()
    hist = tr.fit(train_ds, val_ds, verbose=False)
    assert np.isfinite([h["loss"] for h in hist]).all()


def test_checkpoint_roundtrip(small_square, tmp_path):
    tc = TrainConfig(
        model="FCNN", epochs=5, num_train=8, num_val=4, eval_every=5,
        model_kwargs={"hidden_dims": (8,)}, data_parallel=False,
    )
    tr = Trainer(small_square, tc)
    train_ds, val_ds = tr.make_datasets()
    tr.fit(train_ds, None, verbose=False)
    path = tr.save_checkpoint(str(tmp_path))
    pred_before = np.asarray(tr._eval_forward(tr.state, val_ds.batch, tr.ops))

    tr2 = Trainer(small_square, tc)
    pred_fresh = np.asarray(tr2._eval_forward(tr2.state, val_ds.batch, tr2.ops))
    assert not np.allclose(pred_fresh, pred_before)
    tr2.load_checkpoint(path)
    pred_after = np.asarray(tr2._eval_forward(tr2.state, val_ds.batch, tr2.ops))
    np.testing.assert_allclose(pred_after, pred_before, rtol=1e-6)


def test_timedep_training_smoke():
    p = build_problem(
        ProblemConfig(name="timedep_stokes", bc="lower", nx=4, forcing="five", seq_len=3)
    )
    tc = TrainConfig(
        model="RNN", lr=1e-3, epochs=20, num_train=8, num_val=4,
        eval_every=10, model_kwargs={"hidden": 32},
    )
    tr = Trainer(p, tc)
    train_ds, val_ds = tr.make_datasets()
    hist = tr.fit(train_ds, val_ds, verbose=False)
    assert np.isfinite(hist[-1]["loss"])
    assert "traj_rel_l2" in hist[-1]


def test_timedep_supervised_mode():
    """loss_mode='supervised' on a rollout problem trains MSE against the
    implicit-Euler trajectory (truth sliced to the training seq_len)."""
    p = build_problem(
        ProblemConfig(name="timedep_stokes", bc="lower", nx=4, forcing="five",
                      seq_len=3)
    )
    tc = TrainConfig(
        model="RNN", lr=2e-3, epochs=60, num_train=8, num_val=4,
        eval_every=30, loss_mode="supervised", data_parallel=False,
        model_kwargs={"hidden": 32},
    )
    tr = Trainer(p, tc)
    train_ds, val_ds = tr.make_datasets()
    hist = tr.fit(train_ds, val_ds, verbose=False)
    assert hist[-1]["loss"] < hist[0]["loss"]
    assert np.isfinite(hist[-1]["traj_rel_l2"])


def test_lbfgs_optimizer(small_square):
    tc = TrainConfig(
        model="FCNN", optimizer="lbfgs", lr=1.0, epochs=10, num_train=8,
        num_val=4, eval_every=10, model_kwargs={"hidden_dims": (8,)},
        data_parallel=False,
    )
    tr = Trainer(small_square, tc)
    train_ds, _ = tr.make_datasets()
    hist = tr.fit(train_ds, None, verbose=False)
    assert np.isfinite(hist[-1]["loss"])


def test_tensor_parallel_matches_single_device(small_square):
    """TP correctness: on the 2-D ('data', 'model') mesh, with the
    coefficient head column-sharded and dense operators row-sharded, the
    train step produces the same loss and updated params as the
    single-device step (same seed, same batch)."""
    assert len(jax.devices()) == 8
    tc_kw = dict(
        model="Net2D", lr=1e-3, epochs=1, num_train=16, num_val=4,
        eval_every=1, model_kwargs={"filters": 4}, seed=3,
    )
    tr1 = Trainer(small_square, TrainConfig(
        data_parallel=False, model_axis=1, **tc_kw))
    trtp = Trainer(small_square, TrainConfig(model_axis=4, **tc_kw))
    assert trtp.mesh is not None and trtp.mesh.shape == {"data": 2, "model": 4}

    # the head kernel really is row-sharded over 'model' (input-feature axis)
    head = trtp.state.params["Dense_0"]["kernel"]
    spec = head.sharding.spec
    assert spec[0] == "model", spec

    batch = small_square.sample_batch(jax.random.PRNGKey(11), 16)
    from feonet_navier_stokes_tpu.parallel import shard_batch

    rng = jax.random.PRNGKey(5)
    results = {}
    for name, tr, b in (
        ("single", tr1, batch),
        ("tp", trtp, shard_batch(batch, trtp.mesh)),
    ):
        state = tr.state
        for _ in range(3):
            state, loss = tr._train_step(state, b, rng, tr.ops)
        results[name] = (float(loss), jax.device_get(state.params))

    np.testing.assert_allclose(results["tp"][0], results["single"][0], rtol=1e-5)
    # Param tolerance is looser than the DP test's: row-parallel splits the
    # head contraction into per-shard partial sums (one all-reduce), so every
    # activation differs at f32 eps and Adam's grad/sqrt(nu) rescaling
    # amplifies that over the 3 steps. A systematic error (missing psum,
    # per-shard bias double-count) would shift the LOSS, checked tightly above.
    for a, b in zip(
        jax.tree.leaves(results["single"][1]), jax.tree.leaves(results["tp"][1])
    ):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-5)


def test_tensor_parallel_fit_smoke(small_square):
    """End-to-end fit() on the (data=4, model=2) mesh stays finite and the
    eval path (gathered predictions) works."""
    tc = TrainConfig(
        model="Net2D", lr=1e-3, epochs=10, num_train=16, num_val=4,
        eval_every=5, model_kwargs={"filters": 4}, model_axis=2,
    )
    tr = Trainer(small_square, tc)
    train_ds, val_ds = tr.make_datasets()
    hist = tr.fit(train_ds, val_ds, verbose=False)
    assert np.isfinite([h["loss"] for h in hist]).all()
    assert np.isfinite(hist[-1]["coeff"])


@pytest.mark.slow
def test_accuracy_regression_pin(small_square):
    """Accuracy can't silently rot: the ne=72 channel-flow config after a
    fixed small budget (1500 epochs, 64 samples, seed 0) must reach the
    rel-L2 levels measured when this pin was created (coeff 0.080, p 0.0059
    on 2026-08-16; ceilings give ~2x headroom for backend jitter). The full
    80k-epoch budget reaches coeff 0.0014 (runs/parity_ext_result.json)."""
    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem

    p = build_problem(
        ProblemConfig(name="stokes_square", bc="channel_flow", nx=6)
    )
    tc = TrainConfig(
        model="Net2D", lr=2e-3, epochs=1500, num_train=64, num_val=16,
        eval_every=500, data_parallel=False, seed=0,
        model_kwargs={"filters": 16, "kernel_size": 5},
    )
    tr = Trainer(p, tc)
    train_ds, val_ds = tr.make_datasets()
    hist = tr.fit(train_ds, val_ds, verbose=False)
    assert hist[-1]["coeff"] < 0.15, hist[-1]
    assert hist[-1]["p"] < 0.02, hist[-1]


def test_supervised_and_hybrid_modes(small_square):
    """loss_mode='supervised' trains MSE against the solver ground truth
    (sidestepping residual conditioning — the large-ng accuracy path);
    'hybrid' adds the weighted Galerkin residual. Both must reduce loss and
    produce finite metrics."""
    for mode in ("supervised", "hybrid"):
        tc = TrainConfig(
            model="Net2D", lr=2e-3, epochs=100, num_train=16, num_val=8,
            eval_every=50, data_parallel=False, loss_mode=mode,
            residual_weight=0.01, model_kwargs={"filters": 4},
        )
        tr = Trainer(small_square, tc)
        train_ds, val_ds = tr.make_datasets()
        hist = tr.fit(train_ds, val_ds, verbose=False)
        assert hist[-1]["loss"] < hist[0]["loss"], mode
        assert np.isfinite(hist[-1]["coeff"]), mode


def test_equilibrated_problem_roundtrip_and_training():
    """ProblemConfig(equilibrate=True): the training system is the Ruiz-scaled
    one — exactly solving op_train u_hat = load and unmapping (u = dc*u_hat)
    must reproduce the RAW-system ground truth; training must still run."""
    p = build_problem(
        ProblemConfig(name="stokes_square", bc="lower", nx=4, equilibrate=True)
    )
    batch = p.sample_batch(jax.random.PRNGKey(0), 4)
    # batch["load"] is the row-scaled rhs; ground_truth uses the raw system
    op = np.asarray(p.op_train, dtype=np.float64)
    u_hat = np.linalg.solve(op, np.asarray(batch["load"], dtype=np.float64).T).T
    u = np.asarray(p.unmap(jnp.asarray(u_hat)))
    truth = p.ground_truth(batch)
    np.testing.assert_allclose(u, truth, rtol=2e-4, atol=1e-5)
    tc = TrainConfig(
        model="FCNN", lr=1e-3, epochs=60, num_train=16, num_val=8,
        eval_every=30, data_parallel=False, model_kwargs={"hidden_dims": (16,)},
    )
    tr = Trainer(p, tc)
    train_ds, val_ds = tr.make_datasets()
    hist = tr.fit(train_ds, val_ds, verbose=False)
    assert hist[-1]["loss"] < hist[0]["loss"]
    assert np.isfinite(hist[-1]["coeff"])


def test_grad_clip_trains(small_square):
    """grad_clip>0 chains global-norm clipping before Adam; training still
    reduces the loss (stabilizer for full-batch residual spikes)."""
    tc = TrainConfig(
        model="FCNN", lr=2e-3, epochs=100, num_train=16, num_val=8,
        eval_every=50, data_parallel=False, grad_clip=1.0,
        model_kwargs={"hidden_dims": (16,)},
    )
    tr = Trainer(small_square, tc)
    train_ds, val_ds = tr.make_datasets()
    hist = tr.fit(train_ds, val_ds, verbose=False)
    assert hist[-1]["loss"] < hist[0]["loss"]


def test_supervised_requires_truth(small_square):
    tc = TrainConfig(
        model="FCNN", epochs=5, num_train=8, num_val=4, loss_mode="supervised",
        truth_for_train=False, data_parallel=False,
        model_kwargs={"hidden_dims": (8,)},
    )
    tr = Trainer(small_square, tc)
    train_ds, _ = tr.make_datasets(with_truth=False)
    with pytest.raises(ValueError, match="truth"):
        tr.fit(train_ds, None, verbose=False)


def test_fast_accuracy_pin():
    """FAST-suite accuracy pin (the slow-marked 1500-epoch pin above never
    runs in CI): ne=32 channel flow, FCNN(64,64), 800 epochs, seed 0 reaches
    coeff 0.068 / p 0.027 (measured 2026-08-17); ceilings give ~2x headroom
    for backend jitter. A convergence-quality regression (loss fusion,
    featurization, optimizer wiring) trips this in the default suite."""
    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem

    p = build_problem(
        ProblemConfig(name="stokes_square", bc="channel_flow", nx=4)
    )
    tc = TrainConfig(
        model="FCNN", lr=2e-3, epochs=800, num_train=32, num_val=16,
        eval_every=400, data_parallel=False, seed=0,
        model_kwargs={"hidden_dims": (64, 64)},
    )
    tr = Trainer(p, tc)
    train_ds, val_ds = tr.make_datasets()
    hist = tr.fit(train_ds, val_ds, verbose=False)
    assert hist[-1]["coeff"] < 0.14, hist[-1]
    assert hist[-1]["p"] < 0.06, hist[-1]


def test_resample_every_infinite_data(small_square):
    """Label-free infinite-data regime: the train batch is redrawn every N
    epochs (fresh loads, host f64) with no jit recompile; supervised mode
    rejects it (fresh truth would need solves)."""
    tc = TrainConfig(
        model="FCNN", lr=2e-3, epochs=120, num_train=16, num_val=8,
        eval_every=60, data_parallel=False, resample_every=20,
        model_kwargs={"hidden_dims": (16,)},
    )
    tr = Trainer(small_square, tc)
    train_ds, val_ds = tr.make_datasets()
    hist = tr.fit(train_ds, val_ds, verbose=False)
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["loss"] < hist[0]["loss"]

    tc_bad = TrainConfig(
        model="FCNN", epochs=5, num_train=8, num_val=4,
        loss_mode="supervised", resample_every=10, data_parallel=False,
        model_kwargs={"hidden_dims": (8,)},
    )
    tr2 = Trainer(small_square, tc_bad)
    ds2, _ = tr2.make_datasets()
    import pytest as _pytest
    with _pytest.raises(ValueError, match="resample_every"):
        tr2.fit(ds2, None, verbose=False)


def test_split_hybrid_resample(small_square):
    """Split hybrid: loss_mode='hybrid' + resample_every>0 keeps the
    supervised anchor on the FIXED labeled set while the Galerkin residual
    term sees fresh unlabeled batches — the label-free infinite-data
    regularizer for problems whose truth is expensive (steady NS). Must
    train without recompiles and reduce the loss; batch_size rejects it."""
    tc = TrainConfig(
        model="FCNN", lr=2e-3, epochs=120, num_train=16, num_val=8,
        eval_every=60, data_parallel=False, loss_mode="hybrid",
        residual_weight=0.1, resample_every=20, resample_size=8,
        model_kwargs={"hidden_dims": (16,)},
    )
    tr = Trainer(small_square, tc)
    train_ds, val_ds = tr.make_datasets()
    hist = tr.fit(train_ds, val_ds, verbose=False)
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["loss"] < hist[0]["loss"]

    tc_bad = TrainConfig(
        model="FCNN", epochs=5, num_train=8, num_val=4, batch_size=4,
        loss_mode="hybrid", resample_every=10, data_parallel=False,
        model_kwargs={"hidden_dims": (8,)},
    )
    tr2 = Trainer(small_square, tc_bad)
    ds2, _ = tr2.make_datasets()
    import pytest as _pytest
    with _pytest.raises(ValueError, match="full-batch"):
        tr2.fit(ds2, None, verbose=False)


def test_ema_averaging(small_square):
    """EMA (Polyak) averaging: ema_params track but lag the raw iterates,
    eval/checkpoints consume the averaged params, and the warmup is
    bias-corrected (decay capped at step/(step+2)) so early EMA is not
    pinned to the random init."""
    tc = TrainConfig(
        model="FCNN", lr=5e-3, epochs=60, num_train=16, num_val=8,
        eval_every=30, data_parallel=False, ema_decay=0.99,
        model_kwargs={"hidden_dims": (16,)},
    )
    tr = Trainer(small_square, tc)
    train_ds, val_ds = tr.make_datasets()
    hist = tr.fit(train_ds, val_ds, verbose=False)
    assert np.isfinite(hist[-1]["loss"])

    leaves_p = jax.tree_util.tree_leaves(tr.state.params)
    leaves_e = jax.tree_util.tree_leaves(tr.state.ema_params)
    diffs = [float(jnp.max(jnp.abs(p - e))) for p, e in zip(leaves_p, leaves_e)]
    assert max(diffs) > 0  # lags the iterate...
    rel = [
        float(jnp.linalg.norm(p - e) / (jnp.linalg.norm(p) + 1e-9))
        for p, e in zip(leaves_p, leaves_e)
    ]
    assert max(rel) < 1.0  # ...but tracks it (not stuck at the init)

    # eval uses the EMA params: fit's reported metric matches a manual
    # evaluate() (EMA path), and differs from a raw-params evaluation
    import dataclasses as _dc

    out_ema = tr.evaluate(val_ds)
    tr_raw = Trainer(small_square, _dc.replace(tc, ema_decay=0.0))
    tr_raw.state = tr.state
    out_raw = tr_raw.evaluate(val_ds)
    assert abs(out_ema["coeff"] - hist[-1]["coeff"]) < 1e-6
    assert out_ema["coeff"] != out_raw["coeff"]


def test_correction_penalty_adds_exact_term(small_square):
    """correction_penalty adds cp * mean(sum(raw^2)) to the loss — the
    label-free minimal-correction root-selection term (trainer.py:299-305).
    Same seed => identical init params, so the two losses must differ by
    exactly the penalty evaluated on the raw (pre-shift) outputs."""
    kw = dict(
        model="FCNN", lr=1e-3, epochs=1, num_train=8, num_val=4,
        eval_every=1, model_kwargs={"hidden_dims": (8,)}, seed=11,
        data_parallel=False,
    )
    tr0 = Trainer(small_square, TrainConfig(correction_penalty=0.0, **kw))
    tr1 = Trainer(small_square, TrainConfig(correction_penalty=0.5, **kw))
    batch = small_square.sample_batch(jax.random.PRNGKey(1), 8)
    rng = jax.random.PRNGKey(2)
    l0, _ = tr0._loss_value(tr0.state.params, tr0.state.batch_stats, batch, rng, tr0.ops)
    l1, _ = tr1._loss_value(tr1.state.params, tr1.state.batch_stats, batch, rng, tr1.ops)
    x = small_square.model_input(batch, "FCNN")
    raw, _ = tr0._apply(tr0.state.params, tr0.state.batch_stats, x, train=True, rng=rng)
    pen = 0.5 * jnp.mean(jnp.sum(jnp.square(raw), axis=-1))
    np.testing.assert_allclose(float(l1 - l0), float(pen), rtol=1e-5)

    # and training with the penalty still reduces the loss
    tr1b = Trainer(small_square, TrainConfig(**{**kw, "epochs": 60, "eval_every": 30},
                                             correction_penalty=1e-3))
    train_ds, val_ds = tr1b.make_datasets()
    hist = tr1b.fit(train_ds, val_ds, verbose=False)
    assert hist[-1]["loss"] < hist[0]["loss"]


def test_divergence_guard_aborts_and_restores(small_square):
    """Loss-explosion abort (trainer.py divergence_factor): a FINITE loss
    blow-up — which passes the isfinite nan_guard — must stop the run at the
    next eval window and restore the best-tracked state. The explosion is
    injected deterministically by wrapping the train step (the real-world
    trigger, runs/r2c/ns450_hysplit6k's 6e24 split-hybrid blow-up, needs
    hours to reproduce)."""
    tc = TrainConfig(
        model="FCNN", lr=1e-3, epochs=100, num_train=16, num_val=8,
        eval_every=20, data_parallel=False, divergence_factor=1e4,
        model_kwargs={"hidden_dims": (16,)},
    )
    tr = Trainer(small_square, tc)
    train_ds, val_ds = tr.make_datasets()

    orig = tr._train_step
    calls = {"n": 0}

    def exploding_step(state, batch, rng, ops, res_batch=None):
        state, loss = orig(state, batch, rng, ops, res_batch)
        calls["n"] += 1
        if calls["n"] > 30:
            loss = loss * 0 + 1e24  # finite — passes isfinite
        return state, loss

    tr._train_step = exploding_step
    hist = tr.fit(train_ds, val_ds, verbose=False)
    div = [h for h in hist if "diverged" in h]
    assert div, "divergence guard never tripped"
    assert div[0]["restored_best"]
    assert div[0]["diverged"] == 40  # first eval window after the blow-up
    assert calls["n"] <= 45  # stopped right there, not at the full budget
    # the live params ARE the best snapshot again
    for a, b in zip(
        jax.tree.leaves(jax.device_get(tr.state.params)),
        jax.tree.leaves(jax.device_get(tr.best["params"])),
    ):
        np.testing.assert_array_equal(a, b)


def test_track_best_restores_at_end(small_square):
    """track_best: when the final eval is worse than the best mid-run eval,
    fit() leaves the trainer at the best state (and records it in history).
    Forced by a cosine-free constant high LR that oscillates."""
    tc = TrainConfig(
        model="FCNN", lr=3e-2, epochs=200, num_train=16, num_val=8,
        eval_every=20, data_parallel=False, divergence_factor=0.0,
        model_kwargs={"hidden_dims": (16,)}, seed=3,
    )
    tr = Trainer(small_square, tc)
    train_ds, val_ds = tr.make_datasets()
    hist = tr.fit(train_ds, val_ds, verbose=False)
    assert tr.best is not None
    # evaluate() at the final state must equal the best-tracked metric
    # (either the run ended at its best, or fit restored the best state)
    out = tr.evaluate(val_ds)
    np.testing.assert_allclose(out["coeff"], tr.best["metric"], rtol=1e-6)
    evals = [h for h in hist if "epoch" in h]
    if any("restored_best" in h and "epoch" not in h for h in hist):
        # restoration happened: final eval row was worse than the best
        assert min(e["coeff"] for e in evals) == pytest.approx(tr.best["metric"])


def test_best_checkpoint_saved(small_square, tmp_path):
    """When ckpt_dir is set and fit restores the best state, a 'best'
    checkpoint exists and round-trips."""
    tc = TrainConfig(
        model="FCNN", lr=3e-2, epochs=200, num_train=16, num_val=8,
        eval_every=20, data_parallel=False, ckpt_dir=str(tmp_path),
        model_kwargs={"hidden_dims": (16,)}, seed=3,
    )
    tr = Trainer(small_square, tc)
    train_ds, val_ds = tr.make_datasets()
    hist = tr.fit(train_ds, val_ds, verbose=False)
    restored = [h for h in hist if h.get("restored_best") and "epoch" not in h]
    if restored:
        assert os.path.isdir(os.path.join(str(tmp_path), "best"))
        tr2 = Trainer(small_square, tc)
        tr2.load_checkpoint(os.path.join(str(tmp_path), "best"))
        out = tr2.evaluate(val_ds)
        np.testing.assert_allclose(out["coeff"], tr.best["metric"], rtol=1e-5)


def test_hybrid_linearized_trains():
    """hybrid_kind='linearized': supervised anchor + the residual linearized
    about the label (convex, root-unambiguous). Trains on steady_ns, reduces
    loss; exclusive of resample_every; rejected on non-NS problems."""
    p = build_problem(ProblemConfig(name="steady_ns", bc="lower", nx=4,
                                    equilibrate=True, precond_mode="exact",
                                    stokes_shift=True))
    tc = TrainConfig(
        model="FCNN", lr=2e-3, epochs=100, num_train=8, num_val=4,
        eval_every=50, data_parallel=False, loss_mode="hybrid",
        hybrid_kind="linearized", residual_weight=1e-3,
        lr_schedule="warmup_cosine",
        model_kwargs={"hidden_dims": (16,)},
    )
    tr = Trainer(p, tc)
    train_ds, val_ds = tr.make_datasets()
    hist = tr.fit(train_ds, val_ds, verbose=False)
    evals = [h for h in hist if "epoch" in h]
    assert evals[-1]["loss"] < evals[0]["loss"]
    assert np.isfinite(evals[-1]["coeff"])

    import dataclasses as _dc
    with pytest.raises(ValueError, match="exclusive of resample_every"):
        tr2 = Trainer(p, _dc.replace(tc, resample_every=10))
        ds2 = train_ds
        tr2.fit(ds2, None, verbose=False)
    with pytest.raises(ValueError, match="hybrid_kind"):
        Trainer(p, _dc.replace(tc, hybrid_kind="bogus"))


def test_lowp_adam_moments():
    """bf16-SR Adam (opt-in, VERDICT r2 #6b): moments stored bf16, update
    math f32 — trajectory stays close to exact f32 Adam on a quadratic, and
    the stochastic rounding keeps the second moment tracking (1-b2)=1e-3
    increments that round-to-nearest bf16 would swallow."""
    import jax
    import jax.numpy as jnp
    import optax

    from feonet_navier_stokes_tpu.train.optimizers import (
        build_optimizer, scale_by_adam_lowp, _sr_to_bf16, _cheap_rbits,
    )

    # SR is unbiased: mean over many dithered casts converges to the value
    x = jnp.full((20000,), 1.0 + 2 ** -11, jnp.float32)  # halfway point
    r = _cheap_rbits(x.shape, jnp.int32(7), 3)
    m = jnp.mean(_sr_to_bf16(x, r).astype(jnp.float32))
    assert abs(float(m) - float(x[0])) < 2e-4

    def loss(p):
        return jnp.sum((p - 3.0) ** 2) + 0.1 * jnp.sum(p ** 4)

    p0 = jnp.linspace(-1.0, 1.0, 256).reshape(16, 16)

    def run(tx):
        params = {"w": p0}
        state = tx.init(params)

        @jax.jit
        def step(params, state):
            g = jax.grad(lambda q: loss(q["w"]))(params)
            u, state = tx.update(g, state, params)
            return optax.apply_updates(params, u), state

        for _ in range(300):
            params, state = step(params, state)
        return params["w"], state

    w_ref, _ = run(optax.adam(1e-2))
    w_lowp, st = run(
        optax.chain(scale_by_adam_lowp(), optax.scale_by_learning_rate(1e-2))
    )
    # moments really are bf16
    assert st[0].mu["w"].dtype == jnp.bfloat16
    assert st[0].nu["w"].dtype == jnp.bfloat16
    # and the trajectory tracks exact Adam
    assert float(jnp.max(jnp.abs(w_ref - w_lowp))) < 5e-2

    # guard rails
    import pytest
    with pytest.raises(ValueError, match="only supported for adam"):
        build_optimizer("sgd", 1e-3, moment_dtype="bfloat16")
    with pytest.raises(ValueError, match="moment_dtype"):
        build_optimizer("adam", 1e-3, moment_dtype="float16")


def test_tp_full_resume(small_square, tmp_path):
    """Full resume (opt_state + EMA) under tensor parallelism: restored
    moments are re-placed with the compiled tx.init output shardings
    (VERDICT r2 weak #8 — previously raised NotImplementedError)."""
    import jax

    tc = TrainConfig(
        model="FCNN", epochs=6, num_train=8, num_val=4, eval_every=3,
        model_kwargs={"hidden_dims": (8,)}, model_axis=4, ema_decay=0.9,
    )
    tr = Trainer(small_square, tc)
    train_ds, val_ds = tr.make_datasets()
    tr.fit(train_ds, None, verbose=False)
    path = tr.save_checkpoint(str(tmp_path))
    mu_before = jax.tree.leaves(jax.device_get(tr.state.opt_state))

    tr2 = Trainer(small_square, tc)
    tr2.load_checkpoint(path, params_only=False)
    assert int(tr2.state.step) == 6
    mu_after = jax.tree.leaves(jax.device_get(tr2.state.opt_state))
    for a, b in zip(mu_before, mu_after):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # moments carry the TP shardings and a further step runs under the mesh
    tr2.fit(train_ds, val_ds, verbose=False)
    assert np.isfinite(tr2.history[-1]["loss"])


def test_adafactor_optimizer():
    """Opt-in factored-moment optimizer: state is O(m+n) per (m, n) matrix
    (the HBM-bandwidth lever for the optimizer-bound BSR-47k step) and it
    minimizes a quadratic like Adam does."""
    import jax
    import jax.numpy as jnp
    import optax

    from feonet_navier_stokes_tpu.train.optimizers import build_optimizer

    tx = build_optimizer("adafactor", 1e-1, grad_clip=1.0)
    params = {"w": jnp.linspace(-1.0, 1.0, 512 * 256).reshape(512, 256)}
    state = tx.init(params)
    # factored: no (512, 256) second-moment accumulator in the state
    big = [l for l in jax.tree_util.tree_leaves(state)
           if getattr(l, "shape", ()) == (512, 256)]
    assert not big, "adafactor state holds a full-size accumulator"

    @jax.jit
    def step(params, state):
        g = jax.grad(lambda q: jnp.sum((q["w"] - 3.0) ** 2))(params)
        u, state = tx.update(g, state, params)
        return optax.apply_updates(params, u), state

    l0 = float(jnp.sum((params["w"] - 3.0) ** 2))
    for _ in range(200):
        params, state = step(params, state)
    l1 = float(jnp.sum((params["w"] - 3.0) ** 2))
    assert l1 < 1e-3 * l0, (l0, l1)


def test_scan_steps_matches_per_step(small_square):
    """scan_steps correctness: K epochs in jitted scan blocks produce the
    same training trajectory as K per-dispatch epochs (full batch, no
    dropout -> the per-step rng is unused and the math is identical)."""
    kw = dict(
        model="FCNN", lr=1e-3, epochs=6, num_train=16, num_val=4,
        eval_every=3, model_kwargs={"hidden_dims": (8, 8)}, seed=3,
        data_parallel=False, track_best=False,
    )
    tr_a = Trainer(small_square, TrainConfig(**kw))
    train_ds, val_ds = tr_a.make_datasets()
    hist_a = tr_a.fit(train_ds, val_ds, verbose=False)
    tr_b = Trainer(small_square, TrainConfig(**kw, scan_steps=3))
    hist_b = tr_b.fit(train_ds, val_ds, verbose=False)
    assert len(hist_a) == len(hist_b)
    for ra, rb in zip(hist_a, hist_b):
        assert ra["epoch"] == rb["epoch"]
        # scan-body XLA fuses slightly differently than the standalone step
        # (f32 reassociation), and the residual ops' conditioning amplifies
        # it per step — the trajectories must TRACK, not match bitwise
        np.testing.assert_allclose(ra["loss"], rb["loss"], rtol=5e-3)
    pa = jax.tree.leaves(tr_a.state.params)
    pb = jax.tree.leaves(tr_b.state.params)
    for a, b in zip(pa, pb):
        # Adam moves every element ~lr per step, and the scan body's XLA
        # fusion reassociates f32 differently than the standalone step, so
        # individual elements drift a few e-4 in 6 steps — require the
        # PARAMETER VECTOR to agree in norm, not bitwise
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-12)
        assert rel < 2e-2, rel  # wiring bugs (skipped/extra steps) give O(1)
    assert int(tr_b.state.step) == 6


def test_scan_steps_cadence_validation(small_square):
    with pytest.raises(ValueError):
        Trainer(small_square, TrainConfig(
            model="FCNN", model_kwargs={"hidden_dims": (4,)},
            eval_every=100, scan_steps=33))


def test_scan_steps_with_resampling(small_square):
    """Resampled label-free training under scan blocks: fresh batches still
    arrive on the resample_every cadence (blocks never cross a boundary)."""
    tc = TrainConfig(
        model="FCNN", lr=1e-3, epochs=20, num_train=8, num_val=4,
        eval_every=10, resample_every=10, scan_steps=5,
        model_kwargs={"hidden_dims": (8,)}, data_parallel=False,
        track_best=False,
    )
    tr = Trainer(small_square, tc)
    train_ds, val_ds = tr.make_datasets()
    hist = tr.fit(train_ds, val_ds, verbose=False)
    assert hist[-1]["epoch"] == 20
    assert int(tr.state.step) == 20
