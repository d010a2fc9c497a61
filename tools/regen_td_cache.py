"""Regenerate a timedep data cache (train/val + val truth) from the
deterministic dataset seeds (trainer.py make_datasets: train=PRNGKey(5),
val=PRNGKey(10)) — caches are gitignored and die with the VM, but they are
pure functions of the problem config, so this rebuilds byte-identical splits
for cascade/eval tooling (tools/td_cascade.py --data-cache).

  python tools/regen_td_cache.py --nx 10 --seq-len 10 \
      --out runs/r4/td200_cache.npz
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--problem", default="timedep_stokes")
    ap.add_argument("--forcing", default="five")
    ap.add_argument("--nx", type=int, default=10)
    ap.add_argument("--dt", type=float, default=0.01)
    ap.add_argument("--seq-len", type=int, default=10)
    ap.add_argument("--num-train", type=int, default=1000)
    ap.add_argument("--num-val", type=int, default=1000)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem

    p = build_problem(ProblemConfig(
        name=args.problem, bc="lower", nx=args.nx, dt=args.dt,
        forcing=args.forcing, seq_len=args.seq_len,
        equilibrate=True, precond_mode="exact",
    ))
    train_b = p.sample_batch(jax.random.PRNGKey(5), args.num_train)
    val_b, val_t = p.sample_converged(jax.random.PRNGKey(10), args.num_val)
    payload = {"problem_fingerprint": np.asarray(json.dumps(
        {k: str(v) for k, v in dataclasses.asdict(p.config).items()},
        sort_keys=True))}
    for prefix, batch, truth in (("train", train_b, None),
                                 ("val", val_b, val_t)):
        for k, v in batch.items():
            payload[f"{prefix}_batch_{k}"] = np.asarray(v)
        if truth is not None:
            payload[f"{prefix}_truth"] = np.asarray(truth)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez(args.out, **payload)
    print(f"cached datasets -> {args.out} "
          f"(train {args.num_train}, val {args.num_val}, ng={p.ng})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
