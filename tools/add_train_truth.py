"""Grow a label-free NS cache (build_ns_cache --no-train-truth) into a full
supervised/hybrid cache by solving train-split ground truths in CHUNKS with
incremental saves — interruption-safe, and the sup/hybrid runs can start on a
partially-grown cache with the matching --num-train (the fingerprint tracks
the current count). Companion to tools/extend_ns_cache.py, which grows an
ALREADY-supervised cache.

  JAX_PLATFORM_NAME=cpu python tools/add_train_truth.py \
      --base runs/r2/ns450_stable_lf.npz --out runs/r2/ns450_stable.npz \
      --target 1000 --chunk 100
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
    ap.add_argument("--base", required=True, help="label-free cache npz")
    ap.add_argument("--out", required=True)
    ap.add_argument("--target", type=int, default=1000)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--key-base", type=int, default=5000,
                    help="PRNG stream for train draws (chunk i uses "
                         "key_base+i; disjoint from the val stream 10)")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORM_NAME"])

    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem

    src = args.out if os.path.isfile(args.out) else args.base
    z = np.load(src, allow_pickle=True)
    base_fp = json.loads(str(z["fingerprint"]))
    data = {k: np.asarray(z[k]) for k in z.files if k != "fingerprint"}
    if "train_truth" not in data:
        # fresh start: drop the unconverged label-free train batch
        for k in [k for k in data if k.startswith("train_batch_")]:
            del data[k]
    n_have = data["train_truth"].shape[0] if "train_truth" in data else 0
    print(f"resuming from {src}: {n_have} supervised train samples",
          flush=True)

    p = build_problem(ProblemConfig(
        name="steady_ns", bc=base_fp["bc"], nx=base_fp["nx"],
        op_format="bsr" if base_fp["nx"] >= 40 else "dense"))

    def save(n_total: int) -> None:
        fp = dict(base_fp, num_train=int(n_total), train_truth=True)
        tmp = args.out + ".tmp.npz"
        np.savez(tmp, fingerprint=np.asarray(json.dumps(fp, sort_keys=True)),
                 **data)
        os.replace(tmp, args.out)

    chunk_i = n_have // max(args.chunk, 1)
    while n_have < args.target:
        n = min(args.chunk, args.target - n_have)
        t0 = time.time()
        batch, truth = p.sample_converged(
            jax.random.PRNGKey(args.key_base + chunk_i), n)
        for k, v in batch.items():
            bk = f"train_batch_{k}"
            v = np.asarray(v)
            data[bk] = (v if bk not in data
                        else np.concatenate([data[bk], v], axis=0))
        truth = np.asarray(truth)
        data["train_truth"] = (truth if "train_truth" not in data
                               else np.concatenate(
                                   [data["train_truth"], truth], axis=0))
        n_have += n
        chunk_i += 1
        save(n_have)
        print(f"{n_have}/{args.target} [+{n} in {time.time()-t0:.0f}s] "
              f"-> {args.out}", flush=True)
    print("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
