"""A/B: steady-NS residual training on Newton-FILTERED vs UNFILTERED draws.

Hypothesis (from the 47k runs): label-free NS residual training generalizes
poorly when the train split contains forcing draws with no reachable Newton
solution — the residual objective still forces a fit on them and the smooth
network carries that pollution to the solvable population. The reference
never faces this: its training data comes from the FEniCS solve loop which
RESAMPLES non-converging draws (FEONet_steady_Navier-Stokes/
assemble_fenics.py:204-241), so its train set is converged-only by
construction. Our framework's equivalent filter is
``TrainConfig(truth_for_train=True)`` -> ``Problem.sample_converged``.

Runs both arms at a Newton-cheap scale and writes a JSON verdict.

    python tools/ns_filter_ab.py --nx 16 --epochs 10000
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
    ap.add_argument("--out", default="runs/ns_filter_ab.json")
    args = ap.parse_args()

    import jax

    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
    from feonet_navier_stokes_tpu.train import Trainer, TrainConfig, Dataset

    p = build_problem(
        ProblemConfig(name="steady_ns", bc=args.bc, nx=args.nx, bpx_levels=3)
    )
    print(f"ng={p.ng} m={p.d_out}")

    # shared val set (converged-only, like all our metrics)
    t0 = time.time()
    val_b, val_t = p.sample_converged(jax.random.PRNGKey(10), args.num_val)
    print(f"val truth [{time.time()-t0:.0f}s]")

    # measure the convergence rate of raw draws (context for the verdict)
    probe = p.sample_batch(jax.random.PRNGKey(77), 64)
    _, rel, _ = p._solve_ns_batch(p.load64(probe))
    conv_rate = float((np.asarray(rel) < 1e-9).mean())
    print(f"raw-draw Newton convergence rate: {conv_rate:.2f}")

    results = {"conv_rate_raw_draws": conv_rate}
    for arm in ("unfiltered", "filtered"):
        t0 = time.time()
        if arm == "filtered":
            train_b, _ = p.sample_converged(jax.random.PRNGKey(5), args.num_train)
        else:
            train_b = p.sample_batch(jax.random.PRNGKey(5), args.num_train)
        tc = TrainConfig(
            model="Net2D", lr=args.lr, lr_schedule="cosine", grad_clip=1.0,
            epochs=args.epochs, num_train=args.num_train, num_val=args.num_val,
            eval_every=max(args.epochs // 10, 1),
            model_kwargs={"filters": args.filters, "kernel_size": 5},
        )
        tr = Trainer(p, tc)
        hist = tr.fit(Dataset(train_b, None), Dataset(val_b, val_t),
                      verbose=False)
        results[arm] = {
            "final": {k: v for k, v in hist[-1].items()
                      if k != "time_per_epoch"},
            "wall_s": round(time.time() - t0, 1),
        }
        print(f"{arm}: coeff={hist[-1]['coeff']:.4f} u1={hist[-1]['u1']:.4f} "
              f"[{results[arm]['wall_s']}s]")

    results["verdict"] = (
        "filtered_better"
        if results["filtered"]["final"]["coeff"]
        < 0.8 * results["unfiltered"]["final"]["coeff"]
        else "inconclusive"
    )
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["verdict"], indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
