"""Slim/rehydrate ns450-style supervised caches for git preservation.

A warm-gen cache is ~26 kB/sample of which only the truth is expensive to
recreate (a Newton/Picard solve); the load vectors are an exact f64
re-assembly of the 6 stored sincos parameters (problems/base.py load64).
Round 2 lost all 47k caches with the VM because 400 MB artifacts were
gitignored — `export` keeps coeff_f + f32 truth (~7 kB/sample), small
enough to commit; `rehydrate` reconstructs the full training cache
bit-compatibly (loads re-assembled in f64, cast to f32 like sample_batch).

  python tools/slim_cache.py export  --cache runs/r3/ns450_stable20k.npz \
      --out runs/r3/ns450_slim.npz
  python tools/slim_cache.py rehydrate --slim runs/r3/ns450_slim.npz \
      --out runs/r3/ns450_stable20k.npz [--nx 15 --bc lower ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cmd_export(args) -> int:
    z = np.load(args.cache, allow_pickle=True)
    payload = {}
    for k in z.files:
        if k in ("train_batch_load", "val_batch_load"):
            continue  # re-assembled from coeff_f on rehydrate
        v = z[k]
        if k.endswith("truth") and v.dtype == np.float64:
            v = v.astype(np.float32)
        payload[k] = v
    np.savez_compressed(args.out, **payload)
    print(f"{args.cache} ({os.path.getsize(args.cache)/1e6:.0f} MB) -> "
          f"{args.out} ({os.path.getsize(args.out)/1e6:.0f} MB), "
          f"{payload['train_truth'].shape[0]} train samples")
    return 0


def cmd_rehydrate(args) -> int:
    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem

    # only equilibrate (dr row scaling) affects the stored load vectors;
    # precond/stokes_shift/bpx act downstream of the batch (base.py
    # _train_load64), so the rehydration problem stays minimal
    p = build_problem(ProblemConfig(
        name="steady_ns", bc=args.bc, nx=args.nx,
        equilibrate=args.equilibrate, ns_branch=args.ns_branch,
        bpx_levels=args.bpx_levels, op_format=args.op_format,
    ))
    z = np.load(args.slim, allow_pickle=True)
    payload = {k: z[k] for k in z.files}
    # The stored fingerprint describes the ORIGINAL cache; rehydrating under
    # different flags must not smuggle it through (the train-time check would
    # then validate loads that contradict it). Error on data-affecting
    # disagreements, and always re-stamp from the rehydration config.
    if "problem_fingerprint" in payload:
        have = json.loads(str(payload["problem_fingerprint"]))
        for key in ("equilibrate", "ns_branch"):
            want = str(getattr(p.config, key))
            if key in have and have[key] != want:
                print(f"error: slim cache was exported with {key}="
                      f"{have[key]!r} but rehydrate flags say {want!r}; "
                      "the stored truth would not match the re-assembled "
                      "loads", file=sys.stderr)
                return 1
    import dataclasses as _dc
    payload["problem_fingerprint"] = np.asarray(json.dumps(
        {k: str(v) for k, v in _dc.asdict(p.config).items()},
        sort_keys=True))
    for prefix in ("train", "val"):
        ck = f"{prefix}_batch_coeff_f"
        if ck in payload:
            load = p._train_load64({"coeff_f": payload[ck]})
            payload[f"{prefix}_batch_load"] = load.astype(np.float32)
    np.savez(args.out, **payload)
    print(f"rehydrated {args.out}: "
          f"{payload['train_truth'].shape[0]} train samples")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(__doc__)
    sub = ap.add_subparsers(required=True)
    e = sub.add_parser("export")
    e.add_argument("--cache", required=True)
    e.add_argument("--out", required=True)
    e.set_defaults(fn=cmd_export)
    r = sub.add_parser("rehydrate")
    r.add_argument("--slim", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--nx", type=int, default=15)
    r.add_argument("--bc", default="lower")
    r.add_argument("--equilibrate", action=argparse.BooleanOptionalAction,
                   default=True)
    r.add_argument("--ns-branch", default="stable")
    r.add_argument("--bpx-levels", type=int, default=0)
    r.add_argument("--op-format", default="dense", choices=["dense", "bsr"],
                   help="bsr at the ~47k scale: load re-assembly needs no "
                        "operator, and the dense A64 alone is 18 GB there")
    r.set_defaults(fn=cmd_rehydrate)
    args = ap.parse_args()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
