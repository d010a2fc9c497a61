"""Extend a stretch_run --data-cache with MORE Newton-solved train samples.

Round-1 evidence (commit 867fd0c): the 47k-DoF steady-NS hybrid run overfit
its 128-sample training set mid-run (best 0.093 -> final 0.113). The fix is
data, and each sparse-Newton solve costs ~25 s of host CPU at ng=47379 — so
this tool grows the training split INCREMENTALLY (chunked, checkpointed to
disk after every chunk) and can run nice'd in the background or be resumed
after interruption.

  python tools/extend_ns_cache.py --base runs/ns47k_hybrid_data.npz \
      --out runs/r2/ns47k_hybrid_384.npz --target 384

The output carries the stretch_run fingerprint for its CURRENT sample count,
so a partially-grown cache is already usable with the matching --num-train.
New samples are drawn from keys disjoint from make_datasets' PRNGKey(5)/(10)
train/val streams.
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
    ap.add_argument("--base", required=True, help="existing data-cache npz")
    ap.add_argument("--out", required=True)
    ap.add_argument("--target", type=int, default=384,
                    help="total train samples in the output")
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--nx", type=int, default=72)
    ap.add_argument("--bc", default="lower")
    ap.add_argument("--key-base", type=int, default=7700,
                    help="PRNG stream for new draws (disjoint from 5/10)")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    import jax

    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem

    src = args.out if os.path.isfile(args.out) else args.base
    z = np.load(src, allow_pickle=True)
    data = {k: np.asarray(z[k]) for k in z.files if k != "fingerprint"}
    n_have = data["train_truth"].shape[0]
    print(f"resuming from {src}: {n_have} train samples", flush=True)
    if n_have >= args.target:
        print("target already met")
        return 0

    p = build_problem(ProblemConfig(
        name="steady_ns", bc=args.bc, nx=args.nx, op_format="bsr"))

    def save(n_total: int) -> None:
        fprint = json.dumps({
            "problem": "steady_ns", "nx": args.nx, "bc": args.bc,
            "num_train": int(n_total),
            "num_val": int(data["val_truth"].shape[0]),
            "train_truth": True,
        }, sort_keys=True)
        tmp = args.out + ".tmp.npz"
        np.savez(tmp, fingerprint=np.asarray(fprint), **data)
        os.replace(tmp, args.out)

    chunk_idx = n_have  # key stream indexed by absolute position
    while n_have < args.target:
        n = min(args.chunk, args.target - n_have)
        t0 = time.time()
        batch, truth = p.sample_converged(
            jax.random.PRNGKey(args.key_base + chunk_idx), n)
        want = {k[len("train_batch_"):] for k in data
                if k.startswith("train_batch_")}
        assert set(batch) == want, (set(batch), want)
        for k, v in batch.items():
            bk = f"train_batch_{k}"
            data[bk] = np.concatenate([data[bk], np.asarray(v)], axis=0)
        data["train_truth"] = np.concatenate(
            [data["train_truth"], np.asarray(truth)], axis=0)
        n_have += n
        chunk_idx += n
        save(n_have)
        print(f"{n_have}/{args.target} train samples "
              f"[+{n} in {time.time()-t0:.0f}s] -> {args.out}", flush=True)
    print("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
