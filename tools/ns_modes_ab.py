"""Steady-NS objective comparison on identical data: residual / supervised / hybrid.

Context (measured, tools/ns_filter_ab.py + the 47k runs): the label-free
BPX-conditioned NS residual plateaus at coeff ~0.62 at BOTH nx=16 and nx=72,
warm- or cold-started, while every draw converges (filter hypothesis dead)
and the linearized eff-cond is 553 (bad but not 0.6-bad). The remaining
explanation is the OBJECTIVE: the convection term makes the w-landscape
quartic and training falls into a spurious basin. The reference never
demonstrates label-free NS convergence either (no committed NS results).
This tool measures what the framework should recommend: supervised / hybrid
training on the same filtered data (labels come from our Newton anyway).

    python tools/ns_modes_ab.py --nx 16 --epochs 10000
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
    ap.add_argument("--nx", type=int, default=16)
    ap.add_argument("--bc", default="lower")
    ap.add_argument("--epochs", type=int, default=10000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--num-train", type=int, default=256)
    ap.add_argument("--num-val", type=int, default=64)
    ap.add_argument("--filters", type=int, default=16)
    ap.add_argument("--bpx-levels", type=int, default=3)
    ap.add_argument("--residual-weight", type=float, default=1e-4)
    ap.add_argument("--arms", default="residual,supervised,hybrid")
    ap.add_argument("--data-cache", default="runs/ns_modes_data.npz")
    ap.add_argument("--out", default="runs/ns_modes_ab.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
    from feonet_navier_stokes_tpu.train import Trainer, TrainConfig, Dataset

    p = build_problem(
        ProblemConfig(name="steady_ns", bc=args.bc, nx=args.nx,
                      bpx_levels=args.bpx_levels)
    )
    print(f"ng={p.ng} m={p.d_out}", flush=True)

    t0 = time.time()
    if os.path.isfile(args.data_cache):
        z = np.load(args.data_cache)
        train_b = {k[6:]: jnp.asarray(z[k]) for k in z.files
                   if k.startswith("train_") and k != "train_truth"}
        val_b = {k[4:]: jnp.asarray(z[k]) for k in z.files
                 if k.startswith("val_") and k != "val_truth"}
        train_t, val_t = z["train_truth"], z["val_truth"]
        print(f"loaded {args.data_cache} [{time.time()-t0:.0f}s]", flush=True)
    else:
        train_b, train_t = p.sample_converged(jax.random.PRNGKey(5), args.num_train)
        val_b, val_t = p.sample_converged(jax.random.PRNGKey(10), args.num_val)
        payload = {f"train_{k}": np.asarray(v) for k, v in train_b.items()}
        payload |= {f"val_{k}": np.asarray(v) for k, v in val_b.items()}
        payload |= {"train_truth": train_t, "val_truth": val_t}
        os.makedirs(os.path.dirname(args.data_cache) or ".", exist_ok=True)
        np.savez(args.data_cache, **payload)
        print(f"generated + cached datasets [{time.time()-t0:.0f}s]", flush=True)

    results = {}
    for arm in args.arms.split(","):
        t0 = time.time()
        tc = TrainConfig(
            model="Net2D", lr=args.lr, lr_schedule="cosine", grad_clip=1.0,
            epochs=args.epochs, num_train=args.num_train, num_val=args.num_val,
            eval_every=max(args.epochs // 10, 1), loss_mode=arm,
            residual_weight=args.residual_weight,
            model_kwargs={"filters": args.filters, "kernel_size": 5},
        )
        tr = Trainer(p, tc)
        hist = tr.fit(Dataset(train_b, train_t), Dataset(val_b, val_t),
                      verbose=False)
        results[arm] = {
            "final": {k: v for k, v in hist[-1].items()
                      if k != "time_per_epoch"},
            "wall_s": round(time.time() - t0, 1),
        }
        print(f"{arm}: coeff={hist[-1]['coeff']:.4f} u1={hist[-1]['u1']:.4f} "
              f"[{results[arm]['wall_s']}s]", flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
