"""Square-with-hole headline run: the reference's open problem at exact scale.

Reference config (BASELINE.md row 3): ne=512, channel_flow BC, GRF forcing,
Net2D(resol 50), SPAI(10000); its committed result is UNCONVERGED
(u1/u2/p/coeff = 0.1409/0.5721/0.8972/0.5869,
FEONet-square-with-hole/plot_results_channel_grf.ipynb cell 18).

  python tools/hole_run.py prepare            # CPU: SPAI(10000) + datasets
  python tools/hole_run.py train --epochs 80000   # TPU training + rel-L2

prepare is pure host float64 (run with JAX_PLATFORM_NAME=cpu to keep the
TPU tunnel free); train wants the TPU.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ART_DEFAULT = "artifacts/hole512_channel_grf.npz"


def _problem(precond_iters: int = 0, interp: str = "cubic", resol_in: int = 50,
             bpx_levels: int = 0, hole_h: float = 0.1205,
             op_format: str = "dense", amg_theta: float = 0.08,
             amg_omega: float = 2.0 / 3.0):
    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem

    return build_problem(
        ProblemConfig(
            name="stokes_hole", bc="channel_flow", forcing="grf",
            resol_in=resol_in, precond_iters=precond_iters, interp=interp,
            bpx_levels=bpx_levels, hole_h=hole_h, op_format=op_format,
            amg_theta=amg_theta, amg_omega=amg_omega,
        )
    )


def cmd_prepare(args) -> int:
    import jax

    t0 = time.time()
    p = _problem(interp=args.interp, resol_in=args.resol_in,
                 hole_h=args.hole_h, op_format=args.op_format)
    from feonet_navier_stokes_tpu.linalg import spai, condition_number

    print(f"hole problem ne={p.space.mesh.num_cells} ng={p.ng} "
          f"[{time.time()-t0:.0f}s]", flush=True)
    if args.spai_iters > 0:
        M = spai(p.A64, args.spai_iters)
        cond = condition_number(p.A64 @ M)
        print(f"SPAI({args.spai_iters}) cond: {cond:.7f} "
              f"(reference 1.0000006 at its mesh) [{time.time()-t0:.0f}s]",
              flush=True)
        extra = {"precond": np.asarray(M), "cond_after": cond}
    else:  # datasets-only artifact (BPX training needs no dense SPAI)
        extra = {}
    num_val = args.num_val or args.num
    if args.train_truth:
        train_b, train_t = p.sample_converged(jax.random.PRNGKey(5), args.num)
        train_extra = {"train_truth": np.asarray(train_t)}
    else:  # label-free residual training: loads only, no direct solves
        train_b = p.sample_batch(jax.random.PRNGKey(5), args.num)
        train_extra = {}
    val_b, val_t = p.sample_converged(jax.random.PRNGKey(10), num_val)
    os.makedirs(os.path.dirname(args.art), exist_ok=True)
    np.savez(
        args.art,
        **extra,
        resol_in=args.resol_in,
        interp=args.interp,
        **{f"train_{k}": np.asarray(v) for k, v in train_b.items()},
        **train_extra,
        **{f"val_{k}": np.asarray(v) for k, v in val_b.items()},
        val_truth=np.asarray(val_t),
    )
    print(f"artifacts -> {args.art} [{time.time()-t0:.0f}s total]", flush=True)
    return 0


def cmd_train(args) -> int:
    import jax
    import jax.numpy as jnp

    from feonet_navier_stokes_tpu.train import Trainer, TrainConfig, Dataset

    z = np.load(args.art)
    interp = str(z["interp"]) if "interp" in z.files else "cubic"
    if args.interp:  # A/B override: same data, different featurization
        interp = args.interp
    resol_in = int(z["resol_in"]) if "resol_in" in z.files else 50
    # --bpx-levels swaps the dense SPAI for the algebraic (SA-AMG) BPX
    # congruence — the stored BC-applied loads are exactly what the BPX loss
    # consumes, so the artifact datasets are reused as-is.
    p = _problem(interp=interp, resol_in=resol_in, bpx_levels=args.bpx_levels,
                 hole_h=args.hole_h, op_format=args.op_format,
                 amg_theta=args.amg_theta, amg_omega=args.amg_omega)
    if args.bpx_levels == 0:
        if "precond" not in z.files:
            raise SystemExit(f"{args.art} is a datasets-only artifact "
                             "(prepared with --spai-iters 0); train with "
                             "--bpx-levels or re-prepare with SPAI")
        p.set_precond(z["precond"])
    mkw = json.loads(args.model_kwargs)
    n_train = next(int(z[k].shape[0]) for k in z.files
                   if k.startswith("train_"))
    tc = TrainConfig(
        model=args.model,
        model_kwargs=mkw,
        lr=args.lr,
        lr_schedule=args.lr_schedule,
        ema_decay=args.ema_decay,
        grad_clip=args.grad_clip,
        moment_dtype=args.moment_dtype,
        resample_every=args.resample_every,
        divergence_factor=args.divergence_factor,
        epochs=args.epochs,
        num_train=n_train,
        num_val=int(z["val_truth"].shape[0]),
        eval_every=args.eval_every,
        scan_steps=args.scan_steps,
        ckpt_dir=args.ckpt_dir,
        ckpt_every=args.ckpt_every,
        log_path=args.log,
        truth_for_train="train_truth" in z.files,
    )
    trainer = Trainer(p, tc)
    cond_note = ("algebraic-BPX congruence" if args.bpx_levels
                 else f"cond(op)={float(z['cond_after']):.6f}"
                 if "cond_after" in z.files else "no preconditioner")
    print(f"devices={jax.devices()} params={trainer.n_params:,} "
          f"{cond_note}", flush=True)
    f32 = jnp.float32

    def _ds(prefix):
        batch = {
            k[len(prefix) + 1:]: jnp.asarray(z[k], f32)
            for k in z.files
            if k.startswith(prefix + "_") and not k.endswith("truth")
        }
        truth = (jnp.asarray(z[f"{prefix}_truth"], f32)
                 if f"{prefix}_truth" in z.files else None)
        return Dataset(batch, truth)

    epochs_left = None  # fit() default = tc.epochs
    if args.resume and args.ckpt_dir:
        latest = trainer.latest_checkpoint(args.ckpt_dir)
        if latest:
            # full resume (see tools/ns_run.py): watchdog restarts lose at
            # most one ckpt_every window
            trainer.load_checkpoint(latest, params_only=False)
            done = int(trainer.state.step)
            epochs_left = max(0, args.epochs - done)
            print(f"resumed {latest} (step {done}; {epochs_left} epochs "
                  "left)", flush=True)
    t0 = time.time()
    trainer.fit(_ds("train"), _ds("val"), epochs=epochs_left, verbose=True)
    wall = time.time() - t0
    # history may end with a divergence-guard record ({'diverged': epoch,
    # 'restored_best': ...} — no metric keys). Report the metrics of the
    # state actually held: the best-restored epoch's eval record.
    # Either guard path (divergence abort OR normal end-of-run best-restore)
    # leaves a trailing {'restored_best': ..., 'best_epoch': ...} record: the
    # state actually held/checkpointed is the best epoch's, so report THAT
    # eval record, not the last one (ADVICE r4).
    tail = trainer.history[-1] if trainer.history else {}
    guard = tail if ("diverged" in tail or "restored_best" in tail) else None
    evals = [r for r in trainer.history if "u1" in r]
    if not evals:  # diverged before the first eval window
        evals = [{"epoch": int(trainer.state.step), **trainer.evaluate(_ds("val"))}]
    if guard is not None and guard.get("restored_best"):
        final = next((r for r in evals if r["epoch"] == guard.get("best_epoch")),
                     evals[-1])
    else:
        final = evals[-1]
    result = {
        "problem": f"stokes_hole ne={p.space.mesh.num_cells} (ng={p.ng}) "
                   f"channel_flow GRF, {args.model} + "
                   + (f"BPX-SA({args.bpx_levels})" if args.bpx_levels
                      else "SPAI(10000)")
                   + f", interp={interp}, resol_in={resol_in}",
        "epochs": args.epochs,
        "wall_s": round(wall, 1),
        "model_kwargs": mkw,
        "lr": f"{args.lr} {args.lr_schedule}",
        "ema_decay": args.ema_decay,
        "rel_l2": {k: final[k] for k in ("u1", "u2", "p", "coeff")},
        **({"divergence_guard": {
            "tripped_at": guard["diverged"],
            "reported_epoch": final["epoch"],
        }} if guard is not None and "diverged" in guard else {}),
        "reference": {
            "u1": 0.1409, "u2": 0.5721, "p": 0.8972, "coeff": 0.5869,
            "note": "unconverged — open problem in the reference",
        },
    }
    print(json.dumps(result), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    a = sub.add_parser("prepare")
    a.add_argument("--art", default=ART_DEFAULT)
    a.add_argument("--num", type=int, default=1000)
    a.add_argument("--num-val", type=int, default=0,
                   help="val split size (0 = same as --num)")
    a.add_argument("--spai-iters", type=int, default=10000)
    a.add_argument("--interp", default="cubic")
    a.add_argument("--resol-in", type=int, default=50)
    a.add_argument("--hole-h", type=float, default=0.1205,
                   help="target edge length; 0.03 -> ne=8285/ng=38215 "
                        "(the large-ng stretch)")
    a.add_argument("--op-format", default="dense", choices=["dense", "bsr"])
    a.add_argument("--train-truth", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="--no-train-truth skips the per-sample direct solve "
                        "for the train split (label-free residual training)")
    a.set_defaults(fn=cmd_prepare)
    t = sub.add_parser("train")
    t.add_argument("--art", default=ART_DEFAULT)
    t.add_argument("--model", default="Net2D")
    t.add_argument("--interp", default=None, choices=["cubic", "linear"],
                   help="override the artifact's featurization method "
                        "(A/B: same GRF data, different interpolation)")
    t.add_argument("--amg-theta", type=float, default=0.08,
                   help="SA strength-graph drop tolerance (conditioning "
                        "quality lever for the algebraic BPX)")
    t.add_argument("--amg-omega", type=float, default=2.0 / 3.0,
                   help="SA prolongation-smoothing weight")
    t.add_argument("--bpx-levels", type=int, default=0,
                   help="use the algebraic (SA-AMG) BPX congruence instead "
                        "of the artifact's dense SPAI")
    t.add_argument("--model-kwargs", default='{"filters": 32}')
    t.add_argument("--epochs", type=int, default=80000)
    t.add_argument("--lr", type=float, default=1e-3)
    t.add_argument("--lr-schedule", default="cosine")
    t.add_argument("--ema-decay", type=float, default=0.0)
    t.add_argument("--resample-every", type=int, default=0)
    t.add_argument("--divergence-factor", type=float, default=1e4,
                   help="loss/loss_min abort threshold (TrainConfig."
                        "divergence_factor); 0 disables — the label-free "
                        "resampled BPX objective on the hole spikes "
                        "transiently by >1e4x and self-recovers (r2 "
                        "hole512_bpx job 65; r4 arm-A false abort)")
    t.add_argument("--grad-clip", type=float, default=0.0)
    t.add_argument("--moment-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="bf16 Adam moments (the HBM lever for the ~5e8-param "
                        "head at the large-ng stretch)")
    t.add_argument("--hole-h", type=float, default=0.1205)
    t.add_argument("--op-format", default="dense", choices=["dense", "bsr"])
    t.add_argument("--eval-every", type=int, default=2000)
    t.add_argument("--scan-steps", type=int, default=0,
                   help="K train steps per device dispatch (lax.scan block; full-batch only)")
    t.add_argument("--ckpt-dir", default=None)
    t.add_argument("--ckpt-every", type=int, default=None,
                   help="checkpoint cadence (default = eval_every). The 38k "
                        "config's 756 MB orbax writes correlate with axon "
                        "lost-RPC wedges — a sparser cadence halves the "
                        "exposure at the cost of more redo on restart")
    t.add_argument("--resume", action="store_true",
                   help="full resume from the latest --ckpt-dir checkpoint "
                        "(watchdog restart support)")
    t.add_argument("--log", default=None)
    t.add_argument("--out", default=None)
    t.set_defaults(fn=cmd_train)
    args = ap.parse_args()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
