"""Surrogate + Newton-refinement evaluation for steady NS (ne=450 scale).

Loads a trained checkpoint and the stable-branch cache, reports the raw
surrogate's val rel-L2 and the same after k = 1, 2, 4, 8 warm-started
Newton steps (problems/base.py:refine_ns), with wall times, against the
cold stable solve's cost. This is the deployment story for the nonlinear
problem: the surrogate does the expensive basin-finding, Newton does the
last digits.

  python tools/ns_refine_eval.py --data-cache runs/r2/ns450_stable.npz \
      --ckpt runs/r2/ns450_pen3_ckpt/step_60000 --stokes-shift \
      --model-kwargs '{"filters": 32}'
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
    ap.add_argument("--data-cache", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--nx", type=int, default=15)
    ap.add_argument("--bc", default="lower")
    ap.add_argument("--equilibrate", action="store_true")
    ap.add_argument("--precond-mode", default="exact",
                    help="'spai' (with default precond_iters=0: no precond) "
                         "is the only valid choice at --op-format bsr")
    ap.add_argument("--op-format", default="dense", choices=["dense", "bsr"],
                    help="bsr at the ~47k stretch scale: sparse-Newton "
                         "refinement (problems/base.py:refine_ns bsr branch)")
    ap.add_argument("--stokes-shift", action="store_true")
    ap.add_argument("--bpx-levels", type=int, default=0,
                    help="surrogate trained in BPX w-coordinates (network "
                         "emits w, u = G w + u_bc)")
    ap.add_argument("--model", default="Net2D")
    ap.add_argument("--model-kwargs", default='{"filters": 32}')
    ap.add_argument("--loss-mode", default="residual")
    ap.add_argument("--steps", default="1,2,4,8")
    ap.add_argument("--num-val", type=int, default=0, help="0 = all cached")
    ap.add_argument("--cold-samples", type=int, default=8,
                    help="cold stable solves to time for the comparison")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
    from feonet_navier_stokes_tpu.train import Trainer, TrainConfig, Dataset
    from feonet_navier_stokes_tpu.train.metrics import component_errors

    p = build_problem(ProblemConfig(
        name="steady_ns", bc=args.bc, nx=args.nx,
        equilibrate=args.equilibrate, precond_mode=args.precond_mode,
        ns_branch="stable", stokes_shift=args.stokes_shift,
        op_format=args.op_format, bpx_levels=args.bpx_levels,
    ))
    z = np.load(args.data_cache, allow_pickle=True)
    f32 = jnp.float32
    coeff_f = np.asarray(z["val_batch_coeff_f"])
    truth = np.asarray(z["val_truth"])
    if args.num_val:
        coeff_f, truth = coeff_f[: args.num_val], truth[: args.num_val]
    batch = {"coeff_f": jnp.asarray(coeff_f, f32)}
    batch["load"] = jnp.asarray(p._train_load64({"coeff_f": coeff_f}), f32)
    val_ds = Dataset(batch, jnp.asarray(truth, f32))

    tc = TrainConfig(model=args.model, model_kwargs=json.loads(args.model_kwargs),
                     loss_mode=args.loss_mode, ema_decay=0.999,
                     num_val=len(coeff_f))
    trainer = Trainer(p, tc)
    trainer.load_checkpoint(args.ckpt)

    t0 = time.time()
    pred = np.asarray(trainer._eval_forward(trainer.state, val_ds.batch,
                                            trainer.ops), np.float64)
    t_fwd = time.time() - t0
    rec = {"ckpt": args.ckpt, "n_val": int(len(coeff_f)),
           "surrogate_s": t_fwd}
    errs = component_errors(jnp.asarray(pred, f32), val_ds.truth, p.n2)
    rec["raw"] = {k: float(v) for k, v in errs.items()}
    print("raw:", json.dumps(rec["raw"]), flush=True)

    for k in [int(s) for s in args.steps.split(",") if s]:
        t0 = time.time()
        ref, rel = p.refine_ns(pred, batch, steps=k)
        dt_k = time.time() - t0
        errs = component_errors(jnp.asarray(ref, f32), val_ds.truth, p.n2)
        rec[f"refine_{k}"] = {
            **{kk: float(v) for kk, v in errs.items()},
            "rel_res_max": float(rel.max()),
            "wall_s": dt_k, "per_sample_s": dt_k / len(coeff_f),
        }
        print(f"refine {k}:", json.dumps(rec[f"refine_{k}"]), flush=True)
        if args.out:  # partial write: a killed run keeps finished stages
            with open(args.out, "w") as f:
                json.dump(rec, f, indent=1)

    # cold-solve cost reference
    t0 = time.time()
    n_cold = min(args.cold_samples, len(coeff_f))
    load64 = p.load64({"coeff_f": coeff_f[:n_cold]})
    p._solve_ns_batch(load64)
    rec["cold_solve_per_sample_s"] = (time.time() - t0) / max(n_cold, 1)
    print("cold per-sample s:", rec["cold_solve_per_sample_s"], flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
