"""Closed-form global optimum of the LinearMap model class (analysis tool).

Thin CLI over ``feonet_navier_stokes_tpu.linalg.linear_fit`` — see that
module (and the ``fit-linear`` CLI subcommand) for the method. This tool
only reports the floor; use ``feonet ... fit-linear --ckpt-dir`` to also
save an eval-compatible checkpoint.

  JAX_PLATFORM_NAME=cpu python tools/linear_floor.py \
      --problem stokes_square --bc channel_flow --nx 6 --num-train 6000
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(__doc__)
    ap.add_argument("--problem", default="stokes_square")
    ap.add_argument("--bc", default="channel_flow")
    ap.add_argument("--nx", type=int, default=6)
    ap.add_argument("--forcing", default=None)
    ap.add_argument("--resol-in", type=int, default=None)
    ap.add_argument("--num-train", type=int, default=6000)
    ap.add_argument("--num-val", type=int, default=1000)
    ap.add_argument("--ridge", type=float, default=0.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORM_NAME"])
    import jax.numpy as jnp

    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
    from feonet_navier_stokes_tpu.linalg.linear_fit import linear_map_lstsq
    from feonet_navier_stokes_tpu.train.metrics import component_errors

    extra = {}
    if args.forcing:
        extra["forcing"] = args.forcing
    if args.resol_in:
        extra["resol_in"] = args.resol_in
    pc = ProblemConfig(name=args.problem, bc=args.bc, nx=args.nx,
                       precond_mode="exact", **extra)
    p = build_problem(pc)
    fit = linear_map_lstsq(p, num_train=args.num_train, ridge=args.ridge)

    val_b, val_truth = p.sample_converged(jax.random.PRNGKey(10), args.num_val)
    x = np.asarray(p.model_input(val_b, "LinearMap"), dtype=np.float64)
    pred_w = x.reshape(x.shape[0], -1) @ fit["kernel"].astype(np.float64) \
        + fit["bias"].astype(np.float64)
    u = np.asarray(p.unmap(jnp.asarray(pred_w, dtype=jnp.float32), p.device_ops))
    errs = {k: float(v) for k, v in component_errors(
        jnp.asarray(u), jnp.asarray(np.asarray(val_truth, dtype=np.float32)),
        p.n2).items()}
    rec = {
        "problem": args.problem, "bc": args.bc, "nx": args.nx,
        "num_train": args.num_train, "ridge": args.ridge,
        "train_fit_rms": fit["train_fit_rms"], **errs,
    }
    print(json.dumps(rec))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
