"""``feonet`` CLI: assemble | solve | train | eval | bench.

One entry point for what the reference spreads over 12 per-problem scripts
(assemble_fenics.py / create_data.py / train_FEONet.py x 4 dirs; flag
conventions from FEONet_Stokes_square/train_FEONet.py:26-47 and
FEONet_time_dep_Stokes/train_FEONet.py:28-99):

  feonet assemble --problem stokes_square --bc channel_flow --nx 6 --out data/
  feonet train    --problem stokes_square --bc channel_flow --model UNetWithHead \
                  --epochs 80000 --precond 20000 --ckpt-dir ckpt/ --log out.jsonl
  feonet eval     --problem ... --ckpt ckpt/step_N
  feonet bench    [--config 512]
"""

from __future__ import annotations

import argparse
import json
import sys

# ProblemConfig keys that change the SAMPLED DATA (batch contents or ground
# truth). Everything else (bpx_levels, precond_*, op_format, stokes_shift,
# rollout_metric, p_weight, pad_ng, ...) acts downstream of the batch, so a
# cache mismatch there is a warning, not an error.
DATA_FP_KEYS = frozenset({
    "name", "bc", "forcing", "nx", "hole_h", "resol_in", "interp", "mu",
    "dt", "seq_len", "equilibrate", "ns_branch", "ns_truth",
    "ns_truth_mu_factor", "validate_form",
})


def _add_problem_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--problem", default="stokes_square",
                   choices=["stokes_square", "stokes_hole", "steady_ns", "timedep_stokes", "timedep_ns"])
    p.add_argument("--bc", default="channel_flow",
                   choices=["lower", "zero", "channel_flow"])
    p.add_argument("--forcing", default=None,
                   choices=["sincos", "grf", "five", "zero"],
                   help="default: sincos (steady) / five (timedep)")
    p.add_argument("--nx", type=int, default=6, help="cells per side (ne=2*nx^2)")
    p.add_argument("--hole-h", type=float, default=0.1205)
    p.add_argument("--resol-in", type=int, default=20)
    p.add_argument("--dt", type=float, default=0.01)
    p.add_argument("--seq-len", type=int, default=10)
    p.add_argument("--precond", type=int, default=0, help="SPAI iterations")
    p.add_argument("--precond-mode", default="spai", choices=["spai", "exact"],
                   help="dense right preconditioner: the reference's SPAI "
                        "iteration, or the exact f64 inverse (cond==1; "
                        "activates even with --precond 0)")
    p.add_argument("--mu", type=float, default=None)
    p.add_argument("--ns-truth", default="weak", choices=["weak", "group"],
                   help="steady-NS ground-truth system: true trilinear form "
                        "(FEniCS-like) or the group-FEM training system")
    p.add_argument("--ns-branch", default="stable",
                   choices=["stable", "newton"],
                   help="which root of the (multi-root) steady-NS system is "
                        "the ground truth: the dynamically stable one "
                        "(batched Picard+polish; default) or the reference's "
                        "damped-Newton branch (parity)")
    p.add_argument("--stokes-shift", action="store_true",
                   help="steady_ns + dense preconditioner: the network "
                        "predicts only the convection correction; the "
                        "Stokes solution is added analytically")
    p.add_argument("--ns-truth-mu-factor", type=float, default=1.0,
                   help="viscosity factor for the NS ground-truth solve; 0.5 "
                        "reproduces the reference's half-viscosity truth "
                        "(assemble_fenics.py:192 vs :88 — an upstream wart), "
                        "1.0 solves the self-consistent system")
    p.add_argument("--op-format", default="dense", choices=["dense", "bsr"])
    p.add_argument("--interp", default="cubic", choices=["cubic", "linear"],
                   help="GRF scattered->grid featurization: cubic = the "
                        "reference's Clough-Tocher griddata (exact "
                        "precomputed linear map); linear = barycentric")
    p.add_argument("--bpx-levels", type=int, default=0,
                   help="BPX-congruence residual conditioning: number of "
                        "levels (0 = off; stokes_square/steady_ns via the "
                        "structured nested-mesh hierarchy, stokes_hole via "
                        "the algebraic SA-AMG hierarchy)")
    p.add_argument("--device-loads", action="store_true",
                   help="assemble training loads on device (jit einsum + "
                        "segment_sum; fem/device_assemble.py) — the "
                        "resample_every infinite-data lever on a single-"
                        "core host; ground truth keeps the host f64 path")
    p.add_argument("--pad-ng", action="store_true",
                   help="pad ng to the next 128 multiple through head + "
                        "dense operators (MXU tile alignment; dense steady-"
                        "Stokes paths)")
    p.add_argument("--equilibrate", action="store_true",
                   help="Ruiz-equilibrate the training system (sparsity-"
                        "preserving residual conditioning; all problems — "
                        "for the timedep rollout this is THE label-free "
                        "pressure-conditioning path)")
    p.add_argument("--rollout-metric", default="equation",
                   choices=["equation", "physical"],
                   help="timedep rollout loss metric: 'physical' measures "
                        "the per-step SOLUTION error dc(M r̂) per component "
                        "(requires --equilibrate + a dense preconditioner) "
                        "— the pressure-direction fix the equation metric "
                        "lacks")
    p.add_argument("--p-weight", type=float, default=1.0,
                   help="pressure-block weight in the physical rollout "
                        "metric")


def _build_problem(args):
    from ..problems import ProblemConfig, build_problem

    forcing = args.forcing
    if forcing is None:
        forcing = "five" if args.problem.startswith("timedep") else "sincos"
    cfg = ProblemConfig(
        name=args.problem,
        bc=args.bc,
        forcing=forcing,
        nx=args.nx,
        hole_h=args.hole_h,
        resol_in=args.resol_in,
        dt=args.dt,
        seq_len=args.seq_len,
        precond_iters=args.precond,
        precond_mode=args.precond_mode,
        mu=args.mu,
        ns_truth=args.ns_truth,
        ns_branch=args.ns_branch,
        stokes_shift=args.stokes_shift,
        ns_truth_mu_factor=args.ns_truth_mu_factor,
        op_format=args.op_format,
        interp=args.interp,
        bpx_levels=args.bpx_levels,
        pad_ng=args.pad_ng,
        equilibrate=args.equilibrate,
        rollout_metric=args.rollout_metric,
        p_weight=args.p_weight,
        device_loads=getattr(args, "device_loads", False),
    )
    return build_problem(cfg)


def cmd_assemble(args) -> int:
    """Generate operators + train/validate datasets -> reference-layout npz
    (replaces assemble_fenics.py + create_data.py)."""
    import jax

    from ..data import export_reference_npz, dataset_path

    problem = _build_problem(args)
    train_b, train_t = problem.sample_converged(jax.random.PRNGKey(5), args.num_train)
    val_b, val_t = problem.sample_converged(jax.random.PRNGKey(10), args.num_val)
    path = args.out_file or dataset_path(args.out, problem)
    export_reference_npz(path, problem, train_b, train_t, val_b, val_t)
    print(f"saved {path}: ne={problem.space.mesh.num_cells} ng={problem.ng} "
          f"train={args.num_train} validate={args.num_val}")
    return 0


def cmd_solve(args) -> int:
    """Solve ground truth for freshly sampled instances and print residuals
    (host float64 — exact on every backend, TPU included)."""
    import jax
    import numpy as np

    problem = _build_problem(args)
    batch, truth = problem.sample_converged(jax.random.PRNGKey(args.seed), args.n)
    print(f"solved {args.n} instances: truth shape {tuple(truth.shape)}")
    if not problem.config.name.startswith("timedep"):
        load = problem.load64(batch)
        if problem.config.name == "steady_ns":
            keep = 1.0 - np.asarray(problem.bc.mask)
            r = truth @ problem.A_truth64.T + keep * problem._conv_fn(truth) - load
        else:
            r = truth @ problem.A64.T - load
        rel = np.linalg.norm(r, axis=-1) / np.linalg.norm(load, axis=-1)
        print(f"max rel residual: {float(np.max(rel)):.3e}")
    return 0


def cmd_train(args) -> int:
    from ..train import Trainer, TrainConfig

    problem = _build_problem(args)
    tc = TrainConfig(
        model=args.model,
        optimizer=args.optimizer,
        lr=args.lr,
        lr_schedule=args.lr_schedule,
        grad_clip=args.grad_clip,
        moment_dtype=args.moment_dtype,
        epochs=args.epochs,
        batch_size=args.batch_size,
        num_train=args.num_train,
        num_val=args.num_val,
        seed=args.seed,
        eval_every=args.eval_every,
        ckpt_dir=args.ckpt_dir,
        ckpt_every=args.ckpt_every,
        log_path=args.log,
        truth_for_train=not args.no_train_truth,
        loss_mode=args.loss_mode,
        residual_weight=args.residual_weight,
        hybrid_kind=args.hybrid_kind,
        resample_size=args.resample_size,
        correction_penalty=args.correction_penalty,
        ema_decay=args.ema_decay,
        cascade_epochs=args.cascade_epochs,
        resample_every=args.resample_every,
        conv_ramp_epochs=args.conv_ramp,
        model_kwargs=json.loads(args.model_kwargs),
    )
    if args.precond_file:
        import numpy as np

        z = np.load(args.precond_file)
        M = z["precond"] if hasattr(z, "files") else z
        problem.set_precond(M)
        print(f"loaded preconditioner from {args.precond_file}")
    trainer = Trainer(problem, tc)
    print(f"model={args.model} params={trainer.n_params:,} ng={problem.ng} "
          f"devices={len(__import__('jax').devices())}")
    import os

    import jax.numpy as jnp
    import numpy as np

    from ..train import Dataset

    if args.resume and args.ckpt_dir:
        latest = Trainer.latest_checkpoint(args.ckpt_dir)
        if latest:
            trainer.load_checkpoint(latest)
            print(f"resumed from {latest} (step {int(trainer.state.step)})")
    elif args.init_from:
        trainer.load_checkpoint(args.init_from)
        print(f"warm-started from {args.init_from}")
    import dataclasses as _dc

    # problem fingerprint stored with / checked against the cache: a cache
    # built for one problem config silently trains another otherwise (the r3
    # td_cascade forcing mismatch — 'five' cache under a 'sincos' problem —
    # cost three TPU runs before the 0.156-vs-0.005 discrepancy was traced).
    # Only DATA-AFFECTING keys are a hard error: bpx_levels/precond/op_format/
    # rollout_metric/... act downstream of the sampled batch (slim_cache.py),
    # and rejecting on them would forbid the flagship identical-data A/B
    # (u-coords bpx_levels=0 vs w-coords bpx_levels=3) from one cache.
    prob_fp = json.dumps(
        {k: str(v) for k, v in _dc.asdict(problem.config).items()},
        sort_keys=True)
    if args.data_cache and os.path.isfile(args.data_cache):
        z = np.load(args.data_cache, allow_pickle=True)
        if "problem_fingerprint" in z.files:
            have = json.loads(str(z["problem_fingerprint"]))
            want = json.loads(prob_fp)
            diff = {k for k in want if have.get(k) != want[k]}
            hard = sorted(diff & DATA_FP_KEYS)
            soft = sorted(diff - DATA_FP_KEYS)
            if soft:
                print("warning: --data-cache differs on downstream-only "
                      "keys (data unaffected): "
                      + ", ".join(f"{k} (cache {have.get(k)!r} != run "
                                  f"{want[k]!r})" for k in soft),
                      file=sys.stderr)
            if hard:
                print("error: --data-cache was built for a different "
                      "problem config; mismatched data-affecting keys: "
                      + ", ".join(f"{k} (cache {have.get(k)!r} != run "
                                  f"{want[k]!r})" for k in hard),
                      file=sys.stderr)
                return 1
        def _split(prefix):
            batch = {k[len(prefix) + 7:]: jnp.asarray(z[k])
                     for k in z.files if k.startswith(prefix + "_batch_")}
            tkey = f"{prefix}_truth"
            truth = z[tkey] if tkey in z.files else None
            return Dataset(batch, truth)
        train_ds, val_ds = _split("train"), _split("val")
        print(f"loaded datasets from {args.data_cache}")
        # prefix reuse: a cache with MORE train samples than requested is
        # sliced deterministically (first num_train) instead of rejected or
        # silently used whole — one big committed cache serves every point
        # of a data-scaling curve (r2 exact-match fingerprints forced a
        # snapshot-per-size dance, VERDICT weak#6)
        if 0 < args.num_train < train_ds.n:
            train_ds = Dataset(
                {k: v[: args.num_train] for k, v in train_ds.batch.items()},
                None if train_ds.truth is None
                else train_ds.truth[: args.num_train],
            )
            print(f"sliced cached train split to num_train={args.num_train}")
        elif train_ds.n < args.num_train:
            # loud, not fatal: a data-scaling point trained on fewer samples
            # than its label claims is worse than a failed run
            print(f"WARNING: cache has only {train_ds.n} train samples but "
                  f"--num-train={args.num_train} was requested; training on "
                  f"{train_ds.n}", file=sys.stderr)
    else:
        train_ds, val_ds = trainer.make_datasets()
        if args.data_cache:
            payload = {"problem_fingerprint": np.asarray(prob_fp)}
            for prefix, ds in (("train", train_ds), ("val", val_ds)):
                for k, v in ds.batch.items():
                    payload[f"{prefix}_batch_{k}"] = np.asarray(v)
                if ds.truth is not None:
                    payload[f"{prefix}_truth"] = np.asarray(ds.truth)
            os.makedirs(os.path.dirname(args.data_cache) or ".", exist_ok=True)
            np.savez(args.data_cache, **payload)
            print(f"cached datasets -> {args.data_cache}")
    trainer.fit(train_ds, val_ds)
    if args.ckpt_dir:
        print("final checkpoint:", trainer.save_checkpoint(args.ckpt_dir))
    return 0


def cmd_eval(args) -> int:
    import numpy as np

    from ..train import Trainer, TrainConfig

    if getattr(args, "refine_steps", 0) and args.problem != "steady_ns":
        # fail fast: refine_ns would raise the same constraint only AFTER
        # the (potentially long) eval pass
        print(f"error: --refine-steps applies to --problem steady_ns only "
              f"(got {args.problem!r})", file=sys.stderr)
        return 2
    problem = _build_problem(args)
    # num_train=1 / truth_for_train=False: eval only uses the val split, but
    # make_datasets builds both — the defaults (1000 solver-backed train
    # samples) made `feonet eval` take minutes-to-hours for nothing.
    tc = TrainConfig(model=args.model, num_val=args.num_val,
                     num_train=1, truth_for_train=False,
                     model_kwargs=json.loads(args.model_kwargs),
                     ema_decay=0.999 if args.ema else 0.0)
    trainer = Trainer(problem, tc)
    trainer.load_checkpoint(args.ckpt)
    _, val_ds = trainer.make_datasets()
    metrics = trainer.evaluate(val_ds)
    if getattr(args, "refine_steps", 0):
        # Deployment path for steady NS (docs/navier_stokes.md §3): the
        # prediction warm-starts damped Newton on the weak system — a few
        # steps reach solver accuracy at a fraction of a cold solve's cost.
        from ..train.metrics import component_errors

        pred = np.asarray(trainer._eval_forward(
            trainer.state, val_ds.batch, trainer.ops), np.float64)
        refined, rel = problem.refine_ns(
            pred, val_ds.batch, steps=args.refine_steps)
        errs = component_errors(refined, np.asarray(val_ds.truth, np.float64),
                                problem.n2)
        metrics.update({f"refined_{k}": float(v) for k, v in errs.items()})
        metrics["refined_rel_res_max"] = float(np.max(rel))
    print(json.dumps(metrics))
    if args.plot:
        from ..viz import tricontourf_compare

        pred = np.asarray(trainer._eval_forward(trainer.state, val_ds.batch, trainer.ops))
        truth = np.asarray(val_ds.truth)
        if truth.ndim == 3:  # time-dependent: plot the final step
            pred, truth = pred[:, -1], truth[:, pred.shape[1]]
        path = tricontourf_compare(
            problem,
            pred[args.plot_sample],
            truth[args.plot_sample],
            component=args.plot_component,
            out_path=args.plot,
            title=f"{problem.config.name} / {problem.config.bc} "
                  f"(val sample {args.plot_sample})",
        )
        print(f"plot -> {path}")
    return 0


def cmd_fit_linear(args) -> int:
    """Closed-form global fit of the LinearMap model (linear steady problems
    only): solve the convex label-free residual objective exactly by least
    squares, report val metrics, optionally save an eval-compatible
    checkpoint. See linalg/linear_fit.py."""
    from ..linalg.linear_fit import (
        linear_map_lstsq,
        linear_step_exact,
        set_linear_map_params,
        set_linear_step_params,
    )
    from ..train import Trainer, TrainConfig

    problem = _build_problem(args)
    if args.problem == "timedep_stokes":
        fit = linear_step_exact(problem)
        tc = TrainConfig(model="LinearStep", num_val=args.num_val)
        trainer = Trainer(problem, tc)
        set_linear_step_params(trainer, fit)
        metrics = {}
    else:
        fit = linear_map_lstsq(problem, num_train=args.num_train,
                               ridge=args.ridge)
        tc = TrainConfig(model="LinearMap", num_val=args.num_val)
        trainer = Trainer(problem, tc)
        set_linear_map_params(trainer, fit)
        metrics = {"train_fit_rms": fit["train_fit_rms"]}
    _, val_ds = trainer.make_datasets()
    metrics = {**metrics, **trainer.evaluate(val_ds)}
    print(json.dumps(metrics))
    if args.ckpt_dir:
        path = trainer.save_checkpoint(args.ckpt_dir)
        print(f"checkpoint -> {path}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(metrics, f, indent=1)
    return 0


def cmd_bench(args) -> int:
    import subprocess

    return subprocess.call([sys.executable, "bench.py"])


def _apply_platform_env() -> None:
    """Make JAX_PLATFORM_NAME actually work under the axon TPU plugin.

    Under axon, both the JAX_PLATFORMS and JAX_PLATFORM_NAME env vars are
    ignored (the plugin re-registers the TPU); only
    ``jax.config.update('jax_platforms', ...)`` before first backend use
    takes effect. Honoring the documented env var here lets CPU smoke runs
    coexist with a live TPU job (the axon tunnel admits ONE client; a second
    blocks silently)."""
    import os

    plat = os.environ.get("JAX_PLATFORM_NAME") or os.environ.get(
        "FEONET_PLATFORM"
    )
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def main(argv=None) -> int:
    _apply_platform_env()
    ap = argparse.ArgumentParser("feonet", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    a = sub.add_parser("assemble", help="generate operators + datasets (npz)")
    _add_problem_flags(a)
    a.add_argument("--num-train", type=int, default=1000)
    a.add_argument("--num-val", type=int, default=1000)
    a.add_argument("--out", default="data_ordered")
    a.add_argument("--out-file", default=None)
    a.set_defaults(fn=cmd_assemble)

    s = sub.add_parser("solve", help="ground-truth solve sanity check")
    _add_problem_flags(s)
    s.add_argument("--n", type=int, default=8)
    s.add_argument("--seed", type=int, default=0)
    s.set_defaults(fn=cmd_solve)

    fl = sub.add_parser(
        "fit-linear",
        help="closed-form LinearMap fit (convex residual objective)",
    )
    _add_problem_flags(fl)
    fl.add_argument("--num-train", type=int, default=6000)
    fl.add_argument("--num-val", type=int, default=1000)
    fl.add_argument("--ridge", type=float, default=0.0)
    fl.add_argument("--ckpt-dir", default=None)
    fl.add_argument("--out", default=None)
    fl.set_defaults(fn=cmd_fit_linear)

    t = sub.add_parser("train", help="train a coefficient predictor")
    _add_problem_flags(t)
    t.add_argument("--model", default="UNetWithHead")
    t.add_argument("--optimizer", default="adam")
    t.add_argument("--lr", type=float, default=1e-3)
    t.add_argument("--lr-schedule", default="constant",
                   choices=["constant", "cosine", "exponential",
                            "warmup_cosine"])
    t.add_argument("--grad-clip", type=float, default=0.0,
                   help="global-norm gradient clipping (0 = off)")
    t.add_argument("--moment-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="Adam moment storage dtype (bf16 = stochastic-"
                        "rounded low-precision optimizer state)")
    t.add_argument("--epochs", type=int, default=80000)
    t.add_argument("--batch-size", type=int, default=None)
    t.add_argument("--num-train", type=int, default=1000)
    t.add_argument("--num-val", type=int, default=1000)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--eval-every", type=int, default=100)
    t.add_argument("--ckpt-every", type=int, default=None,
                   help="checkpoint cadence (default: every eval)")
    t.add_argument("--ckpt-dir", default=None)
    t.add_argument("--log", default=None)
    t.add_argument("--init-from", default=None,
                   help="checkpoint path for warm start (reference NS<-Stokes)")
    t.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in --ckpt-dir")
    t.add_argument("--loss-mode", default="residual",
                   choices=["residual", "supervised", "hybrid"],
                   help="residual = label-free Galerkin (reference method); "
                        "supervised = MSE vs solver ground truth; hybrid = both")
    t.add_argument("--residual-weight", type=float, default=1.0,
                   help="residual term weight for --loss-mode hybrid")
    t.add_argument("--hybrid-kind", default="galerkin",
                   choices=["galerkin", "linearized"],
                   help="hybrid physics term: the raw Galerkin residual, or "
                        "the residual linearized about the label (steady_ns; "
                        "convex, root-unambiguous)")
    t.add_argument("--resample-size", type=int, default=0,
                   help="fresh-batch size for split hybrid (0 = train size)")
    t.add_argument("--correction-penalty", type=float, default=0.0,
                   help="penalize the raw output norm (label-free root "
                        "selection for the nonlinear problems; pair with "
                        "--stokes-shift)")
    t.add_argument("--ema-decay", type=float, default=0.0,
                   help="Polyak/EMA parameter averaging for eval+checkpoints "
                        "(0 = off; 0.999 is a good full-batch default)")
    t.add_argument("--cascade-epochs", type=int, default=0,
                   help="residual cascade: train a fresh net on the f64 "
                        "defect of the stage-1 predictions for N epochs "
                        "(label-free boosting; 0 = off)")
    t.add_argument("--resample-every", type=int, default=0,
                   help="label-free infinite data: redraw the train batch "
                        "every N epochs (residual mode only; 0 = off)")
    t.add_argument("--conv-ramp", type=int, default=0,
                   help="NS convection continuation: ramp the quadratic "
                        "term's weight 0->1 over N epochs (0 = off)")
    t.add_argument("--no-train-truth", action="store_true",
                   help="skip reference solves for the train split (residual "
                        "training is label-free; val metrics unaffected)")
    t.add_argument("--data-cache", default=None,
                   help="npz path: save/load the sampled train/val datasets "
                        "(skips expensive ground-truth regeneration)")
    t.add_argument("--precond-file", default=None,
                   help="npy/npz with a precomputed SPAI preconditioner "
                        "(the reference caches these as precond_*.npy)")
    t.add_argument("--model-kwargs", default="{}",
                   help='JSON dict of model hyperparameters, e.g. '
                        '\'{"head_filters": 32}\'')
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("eval", help="evaluate a checkpoint")
    _add_problem_flags(e)
    e.add_argument("--model", default="UNetWithHead")
    e.add_argument("--model-kwargs", default="{}",
                   help="must match the trained architecture")
    e.add_argument("--ema", action="store_true",
                   help="evaluate the checkpoint's EMA params")
    e.add_argument("--ckpt", required=True)
    e.add_argument("--num-val", type=int, default=1000)
    e.add_argument("--refine-steps", type=int, default=0,
                   help="steady_ns only: also report metrics after N "
                        "warm-started Newton refinement steps on the "
                        "predictions (the <1e-3 deployment path; "
                        "docs/navier_stokes.md)")
    e.add_argument("--plot", default=None, metavar="PNG",
                   help="save a (prediction | reference | abs error) "
                        "tricontourf comparison")
    e.add_argument("--plot-component", default="u1",
                   choices=["u1", "u2", "p", "speed"])
    e.add_argument("--plot-sample", type=int, default=0)
    e.set_defaults(fn=cmd_eval)

    b = sub.add_parser("bench", help="run the benchmark harness")
    b.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
