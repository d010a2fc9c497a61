"""Params-only slim checkpoints: git-preservable model snapshots.

An orbax training checkpoint carries opt_state + EMA (3-4x params, ~81 MB
for the td_final RNN) — too heavy to commit, so every round so far has lost
its best trained networks with the VM (runs/*_ckpt*/ is gitignored; the r3
ns450 w-sup 0.00454 net is gone). `export` flattens just the params (and
batch_stats, if any) of an orbax checkpoint into one compressed npz;
`restore` loads such an npz into a Trainer in place of load_checkpoint.

  python tools/slim_ckpt.py export --ckpt runs/r4/wsup16k_ckpt/step_15000 \
      --out runs/r4/wsup16k_params.npz
  # in python: from tools.slim_ckpt import load_params_npz
  #            trainer.state = trainer.state.replace(
  #                params=load_params_npz("...npz")["params"])
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SEP = "//"  # path separator inside npz keys (flax names may contain '_')


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{_SEP}{k}" if prefix else str(k)))
    else:
        out[prefix] = np.asarray(tree)
    return out


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def load_params_npz(path: str) -> dict:
    """-> {'params': tree, 'batch_stats': tree-or-None, 'step': int}"""
    z = np.load(path, allow_pickle=False)
    groups: dict = {"params": {}, "batch_stats": {}}
    step = 0
    for k in z.files:
        head, _, rest = k.partition(_SEP)
        if head == "step":
            step = int(z[k])
        elif head in groups:
            groups[head][rest] = z[k]
    return {
        "params": _unflatten(groups["params"]),
        "batch_stats": _unflatten(groups["batch_stats"]) or None,
        "step": step,
    }


def cmd_export(args) -> int:
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(args.ckpt))
    payload = {f"params{_SEP}{k}": v
               for k, v in _flatten(restored["params"]).items()}
    bs = restored.get("batch_stats")
    if bs:
        payload.update({f"batch_stats{_SEP}{k}": v
                        for k, v in _flatten(bs).items()})
    payload["step"] = np.asarray(restored.get("step", 0))
    np.savez_compressed(args.out, **payload)
    n = sum(int(np.prod(v.shape)) for k, v in payload.items()
            if k.startswith("params"))
    print(f"{args.ckpt} -> {args.out} "
          f"({os.path.getsize(args.out) / 1e6:.1f} MB, {n:,} params)")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(__doc__)
    sub = ap.add_subparsers(required=True)
    e = sub.add_parser("export")
    e.add_argument("--ckpt", required=True)
    e.add_argument("--out", required=True)
    e.set_defaults(fn=cmd_export)
    args = ap.parse_args()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
