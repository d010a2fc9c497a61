"""Build a steady-NS data cache with stable-branch ground truth.

The round-2 ns_branch='stable' solver (see linalg/newton.py:stable_solve_*)
replaces the damped-Newton truth used by runs/r2/ns450_data.npz: draws with
no dynamically reachable steady state report honest residuals and are
RESAMPLED by sample_converged, so the cached operator f -> u is the smooth
stable branch. Output layout + fingerprint match tools/stretch_run.py.

  JAX_PLATFORM_NAME=cpu python tools/build_ns_cache.py \
      --out runs/r2/ns450_stable.npz --num-train 1000 --num-val 200
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
    ap.add_argument("--out", required=True)
    ap.add_argument("--nx", type=int, default=15)
    ap.add_argument("--bc", default="lower")
    ap.add_argument("--num-train", type=int, default=1000)
    ap.add_argument("--num-val", type=int, default=200)
    ap.add_argument("--ns-branch", default="stable")
    ap.add_argument("--op-format", default="dense", choices=["dense", "bsr"],
                    help="bsr at the 47k stretch scale: the batched "
                         "stable-branch sparse solver amortizes ONE "
                         "factorization over the whole batch (vs ~25 s per "
                         "sample for per-sample sparse-LU Newton)")
    ap.add_argument("--no-train-truth", action="store_true",
                    help="skip the expensive train-split solves: the "
                         "label-free (residual+resample) runs only evaluate "
                         "against val truth — the train batch is resampled "
                         "from epoch 1 anyway")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORM_NAME"])

    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem

    t0 = time.time()
    p = build_problem(ProblemConfig(
        name="steady_ns", bc=args.bc, nx=args.nx, ns_branch=args.ns_branch,
        op_format=args.op_format))
    print(f"ng={p.ng} [{time.time()-t0:.0f}s]", flush=True)

    payload: dict[str, np.ndarray] = {}
    # val first: it is 5-6x cheaper than the train split and every consumer
    # needs it — an interrupted build still leaves nothing usable, but the
    # expensive part fails late rather than early
    for prefix, key, n in (("val", 10, args.num_val),
                           ("train", 5, args.num_train)):
        t1 = time.time()
        if prefix == "train" and args.no_train_truth:
            batch = p.sample_batch(jax.random.PRNGKey(key), n)
            truth = None
        else:
            batch, truth = p.sample_converged(jax.random.PRNGKey(key), n)
        for k, v in batch.items():
            payload[f"{prefix}_batch_{k}"] = np.asarray(v)
        if truth is not None:
            payload[f"{prefix}_truth"] = np.asarray(truth)
        print(f"{prefix}: {n} samples [{time.time()-t1:.0f}s]", flush=True)

    fprint = json.dumps({
        "problem": "steady_ns", "nx": args.nx, "bc": args.bc,
        "num_train": args.num_train, "num_val": args.num_val,
        "train_truth": not args.no_train_truth,
    }, sort_keys=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez(args.out, fingerprint=np.asarray(fprint), **payload)
    print(f"wrote {args.out} [{time.time()-t0:.0f}s total]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
