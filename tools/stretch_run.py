"""~50k-DoF stretch training run (SURVEY.md §7 step 7, end to end).

Steady Stokes on a nx=72 structured square: ne=10368 elements, ng=47379
mixed Taylor-Hood DoFs — ~18.5x the reference's largest config (ne=512 /
ng=2549, FEONet-square-with-hole/test.ipynb cells 14-16), where a dense f32
operator would be 9 GB. The run exercises the full large-scale path:

  * host CSR assembly -> Pallas 128x128 block-sparse training operators
    (ops/block_sparse.py, ProblemConfig(op_format='bsr')),
  * Net2D with a 151M-param coefficient head (3200 x 47379),
  * SuperLU sparse-LU ground truth for the validation metrics
    (linalg/solvers.py `_factorize` sparse path),
  * label-free Galerkin-residual training on the real TPU chip.

    python tools/stretch_run.py --epochs 20000

Writes runs/stretch47k_train.jsonl (curve) + runs/stretch47k_result.json.
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--problem", default="stokes_square",
                    choices=["stokes_square", "steady_ns"],
                    help="steady_ns runs the nonlinear convection residual "
                         "with sparse-LU Newton ground truth")
    ap.add_argument("--bc", default=None,
                    help="default: channel_flow (stokes) / lower (ns)")
    ap.add_argument("--nx", type=int, default=72)
    ap.add_argument("--epochs", type=int, default=20000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--lr-schedule", default="cosine")
    ap.add_argument("--grad-clip", type=float, default=0.0)
    ap.add_argument("--moment-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 compute dtype for the model (params f32)")
    ap.add_argument("--num-train", type=int, default=256)
    ap.add_argument("--num-val", type=int, default=64)
    ap.add_argument("--model", default="Net2D",
                    choices=["Net2D", "UNetWithHead"],
                    help="UNetWithHead halves the supervised NS error at "
                         "ne=450 (runs/r2/ns450_sup_unet_result.json); "
                         "--filters maps to its head_filters")
    ap.add_argument("--filters", type=int, default=8)
    ap.add_argument("--model-kwargs", default="",
                    help="JSON merged OVER the per-model defaults (e.g. "
                         '\'{"head_rank": 512, "head_dtype": "bfloat16"}\' '
                         "for the 47k head A/Bs)")
    ap.add_argument("--eval-every", type=int, default=1000)
    ap.add_argument("--scan-steps", type=int, default=0,
                    help="K train steps per device dispatch (lax.scan block; full-batch only)")
    ap.add_argument("--loss-mode", default="residual",
                    choices=["residual", "supervised", "hybrid"])
    ap.add_argument("--residual-weight", type=float, default=1e-5,
                    help="hybrid-mode residual term weight; at this scale the "
                         "raw residual (~5e-2 at optimum) dwarfs the "
                         "supervised MSE (~1e-7), so the default balances "
                         "their gradient contributions")
    ap.add_argument("--bpx-levels", type=int, default=0,
                    help="BPX-congruence residual conditioning (linalg/"
                         "bpx.py): nested mesh levels; the label-free path "
                         "at this scale (0 = off)")
    ap.add_argument("--ema-decay", type=float, default=0.0)
    ap.add_argument("--resample-every", type=int, default=0,
                    help="label-free infinite data: redraw the train batch "
                         "every N epochs")
    ap.add_argument("--resample-size", type=int, default=0,
                    help="fresh-batch size for split hybrid (0 = train size)")
    ap.add_argument("--equilibrate", action="store_true",
                    help="train on the Ruiz-equilibrated system (see "
                         "ProblemConfig.equilibrate) — the sparsity-"
                         "preserving alternative to SPAI at this scale")
    ap.add_argument("--data-cache", default=None,
                    help="npz path: load datasets if it exists, else save "
                         "after generation (the NS sparse-Newton val truth "
                         "costs ~50 min at nx=72 — pay it once)")
    ap.add_argument("--ckpt-dir", default=None,
                    help="save a final checkpoint here")
    ap.add_argument("--init-from", default=None,
                    help="warm-start checkpoint (reference NS<-Stokes "
                         "workflow; requires identical model/d_out)")
    ap.add_argument("--log", default="runs/stretch47k_train.jsonl")
    ap.add_argument("--out", default="runs/stretch47k_result.json")
    args = ap.parse_args()

    import jax

    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
    from feonet_navier_stokes_tpu.train import Trainer, TrainConfig

    t0 = time.time()
    bc = args.bc or ("lower" if args.problem == "steady_ns" else "channel_flow")
    p = build_problem(
        ProblemConfig(
            name=args.problem, bc=bc, nx=args.nx,
            op_format="bsr", equilibrate=args.equilibrate,
            bpx_levels=args.bpx_levels,
        )
    )
    op, _ = p.op_train
    print(
        f"ng={p.ng} ne={p.space.mesh.num_cells} "
        f"bsr tiles={op.blocks.shape[0] - 1}/{op.n_row_blocks * op.n_col_blocks} "
        f"({100 * op.density:.1f}% dense) [{time.time() - t0:.0f}s]"
    )

    if args.model == "UNetWithHead":
        model_kwargs = {
            "head_filters": args.filters, "head_kernel_size": 5,
            **({"compute_dtype": "bfloat16"} if args.bf16 else {}),
        }
    else:
        model_kwargs = {
            "filters": args.filters, "kernel_size": 5,
            **({"compute_dtype": "bfloat16"} if args.bf16 else {}),
        }
    if args.model_kwargs:
        model_kwargs.update(json.loads(args.model_kwargs))
    tc = TrainConfig(
        model=args.model,
        lr=args.lr,
        lr_schedule=args.lr_schedule,
        grad_clip=args.grad_clip,
        moment_dtype=args.moment_dtype,
        epochs=args.epochs,
        num_train=args.num_train,
        num_val=args.num_val,
        eval_every=args.eval_every,
        scan_steps=args.scan_steps,
        log_path=args.log,
        loss_mode=args.loss_mode,
        residual_weight=args.residual_weight,
        resample_every=args.resample_every,
        resample_size=args.resample_size,
        ema_decay=args.ema_decay,
        # residual training is label-free: SuperLU ground truth only for the
        # val split; supervised/hybrid also need train-split labels
        truth_for_train=args.loss_mode != "residual",
        model_kwargs=model_kwargs,
    )
    trainer = Trainer(p, tc)
    print(f"model={args.model} params={trainer.n_params:,} "
          f"backend={jax.default_backend()}")

    if args.init_from:
        trainer.load_checkpoint(args.init_from)
        print(f"warm-started from {args.init_from}")

    t0 = time.time()
    # dataset-identity fingerprint: a cache written for one (problem, mesh,
    # bc, loss mode's truth needs) must not be silently reused for another —
    # mismatches surface as wrong loads / missing train truth much later,
    # mid-training. Split SIZES are prefix-reusable: any cache with
    # num_train >= requested serves a deterministic first-N slice (so a
    # growing gen_warm cache needs no snapshot-before-training dance).
    fp_core = {"problem": args.problem, "nx": args.nx, "bc": bc}
    fprint = json.dumps({
        **fp_core,
        "num_train": args.num_train, "num_val": args.num_val,
        "train_truth": args.loss_mode != "residual",
    }, sort_keys=True)
    if args.data_cache and os.path.isfile(args.data_cache):
        import numpy as _np
        import jax.numpy as jnp

        from feonet_navier_stokes_tpu.train.trainer import Dataset

        z = _np.load(args.data_cache, allow_pickle=True)
        cached_fp = str(z["fingerprint"]) if "fingerprint" in z.files else None
        cached = json.loads(cached_fp) if cached_fp else {}
        bad = [k for k, v in fp_core.items() if cached.get(k) != v]
        if bad:
            raise SystemExit(
                f"--data-cache {args.data_cache} was generated for a "
                f"different config (mismatched {bad}):\n  cached: {cached_fp}"
                f"\n  wanted: {fprint}\n"
                "delete the cache or point --data-cache elsewhere"
            )

        def _split(prefix, n_want):
            batch = {k[len(prefix) + 7:]: jnp.asarray(z[k][:n_want])
                     for k in z.files if k.startswith(prefix + "_batch_")}
            n_cache = next(iter(batch.values())).shape[0] if batch else 0
            if n_cache < n_want:
                raise SystemExit(
                    f"--data-cache has {n_cache} {prefix} samples, "
                    f"{n_want} requested — extend it (tools/gen_warm.py / "
                    f"tools/extend_ns_cache.py) or lower --num-{prefix}"
                )
            tkey = f"{prefix}_truth"
            truth = z[tkey][:n_want] if tkey in z.files else None
            if (prefix == "train" and truth is None
                    and args.loss_mode != "residual"):
                raise SystemExit(
                    f"--data-cache has no train_truth but loss_mode="
                    f"{args.loss_mode!r} needs labels"
                )
            return Dataset(batch, truth)

        train_ds = _split("train", args.num_train)
        val_ds = _split("val", args.num_val)
        print(f"loaded datasets from {args.data_cache} "
              f"(train {train_ds.n}, val {val_ds.n}) [{time.time()-t0:.0f}s]")
    else:
        train_ds, val_ds = trainer.make_datasets()
        print(f"datasets ready (SuperLU truth for {args.num_val} val samples) "
              f"[{time.time() - t0:.0f}s]")
        if args.data_cache:
            payload = {"fingerprint": np.asarray(fprint)}
            for prefix, ds in (("train", train_ds), ("val", val_ds)):
                for k, v in ds.batch.items():
                    payload[f"{prefix}_batch_{k}"] = np.asarray(v)
                if ds.truth is not None:
                    payload[f"{prefix}_truth"] = np.asarray(ds.truth)
            os.makedirs(os.path.dirname(args.data_cache) or ".", exist_ok=True)
            np.savez(args.data_cache, **payload)
            print(f"cached datasets -> {args.data_cache}")

    os.makedirs(os.path.dirname(args.log), exist_ok=True)
    t0 = time.time()
    hist = trainer.fit(train_ds, val_ds, verbose=True)
    wall = time.time() - t0
    if args.ckpt_dir:
        print("final checkpoint:", trainer.save_checkpoint(args.ckpt_dir))

    final = {k: v for k, v in hist[-1].items() if k != "time_per_epoch"}
    result = {
        "problem": (
            f"{args.problem} nx={args.nx} (ne={p.space.mesh.num_cells}, "
            f"ng={p.ng}) {bc}, {args.model}(filters={args.filters}) "
            f"+ Pallas BSR operators — the ~50k-DoF stretch config "
            f"(SURVEY.md §7 step 7; no reference counterpart, its largest "
            f"config is ng=2549)"
            + (" — Ruiz-equilibrated training system" if args.equilibrate else "")
            + (f" — BPX({args.bpx_levels})-congruence residual"
               if args.bpx_levels else "")
        ),
        "loss_mode": args.loss_mode,
        "epochs": args.epochs,
        "lr": f"{args.lr} {args.lr_schedule}",
        "n_params": trainer.n_params,
        "wall_s": round(wall, 1),
        "steps_per_sec": round(args.epochs / wall, 2),
        "final": final,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
