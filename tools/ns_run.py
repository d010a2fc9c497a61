"""Steady Navier-Stokes at the reference scale (ne=450, nx=15) — the
conditioned-residual / hybrid recipe runs (VERDICT round-1 item 2).

Reuses the Newton ground truths from a stretch_run --data-cache npz (the
expensive part: ~1200 sparse-LU Newton solves) but rebuilds the LOAD vectors
for the problem's own conditioning (an equilibrated system trains on dr*f —
a cached raw load would silently be the wrong RHS).

  python tools/ns_run.py --data-cache runs/r2/ns450_data.npz \
      --equilibrate --precond 3000 --loss-mode hybrid --epochs 40000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(__doc__)
    ap.add_argument("--data-cache", required=True)
    ap.add_argument("--num-train", type=int, default=0,
                    help="use only the first N train samples from the cache "
                         "(0 = all) — deterministic prefix slice, for data-"
                         "scaling points from one growing gen_warm cache")
    ap.add_argument("--nx", type=int, default=15)
    ap.add_argument("--bc", default="lower")
    ap.add_argument("--equilibrate", action="store_true")
    ap.add_argument("--precond", type=int, default=0)
    ap.add_argument("--precond-mode", default="spai", choices=["spai", "exact"])
    ap.add_argument("--ns-branch", default="stable", choices=["stable", "newton"])
    ap.add_argument("--stokes-shift", action="store_true",
                    help="network predicts only the convection correction; "
                         "the Stokes solution is added analytically in "
                         "training coordinates")
    ap.add_argument("--loss-mode", default="residual",
                    choices=["residual", "supervised", "hybrid"])
    ap.add_argument("--residual-weight", type=float, default=1e-4)
    ap.add_argument("--hybrid-kind", default="galerkin",
                    choices=["galerkin", "linearized"],
                    help="linearized: the residual linearized about the "
                         "label — convex, root-unambiguous (VERDICT r2 "
                         "item 1 lever b)")
    ap.add_argument("--bpx-levels", type=int, default=0,
                    help="BPX-congruence parameterization: network emits "
                         "w-coordinates, u = G w + u_bc (exact BCs); with "
                         "--loss-mode supervised this is lever (a) — "
                         "supervised training in O(1)-conditioned coords")
    ap.add_argument("--model", default="Net2D")
    ap.add_argument("--model-kwargs", default="",
                    help="JSON; empty = per-model default (Net2D filters=16, "
                         "UNetWithHead class defaults)")
    ap.add_argument("--epochs", type=int, default=40000)
    ap.add_argument("--cascade-epochs", type=int, default=0)
    ap.add_argument("--resample-every", type=int, default=0)
    ap.add_argument("--resample-size", type=int, default=0,
                    help="fresh-batch size for split hybrid (0 = train size)")
    ap.add_argument("--correction-penalty", type=float, default=0.0,
                    help="label-free root selection: penalize the raw "
                         "output norm (with --stokes-shift = distance from "
                         "the Stokes solution)")
    ap.add_argument("--conv-ramp", type=int, default=0,
                    help="convection continuation: ramp gamma 0->1 over N epochs")
    ap.add_argument("--batch-size", type=int, default=0,
                    help="minibatch size (0 = full batch, the parity default)")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--lr-schedule", default="cosine")
    ap.add_argument("--grad-clip", type=float, default=1.0)
    ap.add_argument("--moment-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--ema-decay", type=float, default=0.999)
    ap.add_argument("--eval-every", type=int, default=2000)
    ap.add_argument("--scan-steps", type=int, default=0,
                    help="K train steps per device dispatch (lax.scan block; "
                         "full-batch only) — one host RPC per K steps, so "
                         "the run is immune to host-side CPU contention")
    ap.add_argument("--init-from", default=None)
    ap.add_argument("--resume", action="store_true",
                    help="full resume (params+opt_state+step) from the "
                         "latest checkpoint in --ckpt-dir, running only the "
                         "remaining epochs — watchdog restarts are lossless "
                         "up to one ckpt_every window")
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--log", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
    from feonet_navier_stokes_tpu.train import Trainer, TrainConfig, Dataset

    t0 = time.time()
    p = build_problem(ProblemConfig(
        name="steady_ns", bc=args.bc, nx=args.nx,
        equilibrate=args.equilibrate, precond_iters=args.precond,
        precond_mode=args.precond_mode, ns_branch=args.ns_branch,
        stokes_shift=args.stokes_shift, bpx_levels=args.bpx_levels,
    ))
    print(f"ng={p.ng} equilibrate={args.equilibrate} "
          f"precond={args.precond} [{time.time()-t0:.0f}s]", flush=True)

    z = np.load(args.data_cache, allow_pickle=True)
    f32 = jnp.float32

    def _ds(prefix, need_truth):
        coeff_f = np.asarray(z[f"{prefix}_batch_coeff_f"])
        if prefix == "train" and args.num_train:
            if coeff_f.shape[0] < args.num_train:
                raise SystemExit(
                    f"cache has {coeff_f.shape[0]} train samples, "
                    f"--num-train {args.num_train} requested")
            coeff_f = coeff_f[: args.num_train]
        batch = {"coeff_f": jnp.asarray(coeff_f, f32)}
        # rebuild the load in THIS problem's training equation space
        batch["load"] = jnp.asarray(
            p._train_load64({"coeff_f": coeff_f}), f32
        )
        tkey = f"{prefix}_truth"
        truth = z[tkey] if tkey in z.files else None
        if need_truth and truth is None:
            raise SystemExit(f"cache has no {tkey} (regenerate with hybrid)")
        if truth is not None and prefix == "train" and args.num_train:
            truth = truth[: args.num_train]
        return Dataset(batch, None if truth is None else jnp.asarray(truth, f32))

    train_ds = _ds("train", args.loss_mode != "residual")
    val_ds = _ds("val", True)
    print(f"datasets: train={train_ds.n} val={val_ds.n} "
          f"[{time.time()-t0:.0f}s]", flush=True)

    if args.model_kwargs:
        model_kwargs = json.loads(args.model_kwargs)
    elif args.model in ("Net2D", "NetA", "Net3D"):
        model_kwargs = {"filters": 16}
    else:
        model_kwargs = {}
    tc = TrainConfig(
        model=args.model,
        model_kwargs=model_kwargs,
        batch_size=args.batch_size or None,
        lr=args.lr, lr_schedule=args.lr_schedule, grad_clip=args.grad_clip,
        moment_dtype=args.moment_dtype,
        ema_decay=args.ema_decay, epochs=args.epochs,
        cascade_epochs=args.cascade_epochs,
        resample_every=args.resample_every,
        resample_size=args.resample_size,
        conv_ramp_epochs=args.conv_ramp,
        num_train=train_ds.n, num_val=val_ds.n,
        scan_steps=args.scan_steps,
        eval_every=args.eval_every, ckpt_dir=args.ckpt_dir,
        log_path=args.log, loss_mode=args.loss_mode,
        residual_weight=args.residual_weight,
        hybrid_kind=args.hybrid_kind,
        correction_penalty=args.correction_penalty,
    )
    trainer = Trainer(p, tc)
    print(f"model={args.model} params={trainer.n_params:,} "
          f"devices={jax.devices()}", flush=True)
    if args.init_from:
        trainer.load_checkpoint(args.init_from)
        print(f"warm-started from {args.init_from}", flush=True)
    epochs_left = None  # fit() default = tc.epochs
    if args.resume and args.ckpt_dir:
        latest = trainer.latest_checkpoint(args.ckpt_dir)
        if latest:
            # full resume: params + opt state (the cosine schedule counts
            # inside opt_state, so annealing continues on the original
            # horizon) + EMA + step. Used by tools/watchdog_run.py restarts
            # so a lost-RPC kill costs at most one ckpt_every window.
            trainer.load_checkpoint(latest, params_only=False)
            done = int(trainer.state.step)
            # state.step counts optimizer STEPS; in minibatch mode each
            # epoch is n_batches steps (ADVICE r4: subtracting raw steps
            # undercounted the remaining epochs, often to 0)
            if args.batch_size:
                n_batches = -(-train_ds.n // args.batch_size)
                done = done // n_batches
            epochs_left = max(0, args.epochs - done)
            print(f"resumed {latest} ({done} epochs done; {epochs_left} "
                  "left)", flush=True)
    t0 = time.time()
    hist = trainer.fit(train_ds, val_ds, epochs=epochs_left, verbose=True)
    if not hist:  # resumed past the horizon: report a fresh eval instead
        hist = [{"epoch": int(trainer.state.step), **trainer.evaluate(val_ds)}]
    final = {k: v for k, v in hist[-1].items() if k != "time_per_epoch"}
    result = {
        "problem": f"steady_ns nx={args.nx} (ng={p.ng}) {args.bc} sincos, "
                   f"{args.model}"
                   + (" + Ruiz" if args.equilibrate else "")
                   + ("∘exact-inv" if args.precond_mode == "exact"
                      else f"∘SPAI({args.precond})" if args.precond else ""),
        "loss_mode": args.loss_mode,
        "epochs": args.epochs,
        "cascade_epochs": args.cascade_epochs,
        "lr": f"{args.lr} {args.lr_schedule}",
        "wall_s": round(time.time() - t0, 1),
        "final": final,
    }
    print(json.dumps(result), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
