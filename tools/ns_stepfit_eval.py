"""Steady-NS solver-free defect corrector: fit + eval (VERDICT r4 Next#1c).

Loads a trained stage-1 checkpoint (the w-coordinate supervised surrogate),
fits the averaged inverse Jacobian W from (weak-residual, exact-defect)
pairs on the TRAIN split — the defects are free: e = cached truth - stage-1
prediction, no solves — and evaluates the iterated correction
``u <- u + W r(u)`` on the held-out val split. Inference is einsums + one
(ng x ng) matmul per iteration: no factorization, no Newton, the steady
analog of the r4 timedep LinearStep stage-2 (docs/conditioning.md §6b).

  python tools/ns_stepfit_eval.py --data-cache runs/r3/ns450_slim16k.npz \
      --ckpt /root/ck/ns450_wsup6k/step_30000 --bpx-levels 3 \
      --model UNetWithHead --out runs/r5/ns450_stepfit_result.json

Reference bar: FEONet_steady_Navier-Stokes/train_FEONet.py:301-332 trains
the surrogate only and never corrects it.
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
    ap.add_argument("--ckpt", default=None,
                    help="orbax checkpoint dir (trainer.load_checkpoint)")
    ap.add_argument("--params-npz", default=None,
                    help="slim params npz (tools/slim_ckpt.py export)")
    ap.add_argument("--nx", type=int, default=15)
    ap.add_argument("--bc", default="lower")
    ap.add_argument("--bpx-levels", type=int, default=3)
    ap.add_argument("--model", default="UNetWithHead")
    ap.add_argument("--model-kwargs", default="{}")
    ap.add_argument("--num-fit", type=int, default=0,
                    help="train samples for the W fit (0 = all cached)")
    ap.add_argument("--ridge", type=float, default=1e-10)
    ap.add_argument("--stages", type=int, default=3,
                    help="boosted correction stages to fit")
    ap.add_argument("--chunk", type=int, default=2048,
                    help="forward-pass chunk size")
    ap.add_argument("--fit-dtype", default="float64",
                    choices=["float32", "float64"],
                    help="inference dtype for the reported correction")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
    from feonet_navier_stokes_tpu.train import Trainer, TrainConfig
    from feonet_navier_stokes_tpu.train.metrics import component_errors
    from feonet_navier_stokes_tpu.linalg.ns_corrector import (
        apply_steady_defect_fit, steady_defect_fit)

    t0 = time.time()
    p = build_problem(ProblemConfig(
        name="steady_ns", bc=args.bc, nx=args.nx, ns_branch="stable",
        bpx_levels=args.bpx_levels,
    ))
    z = np.load(args.data_cache, allow_pickle=True)
    f32 = jnp.float32

    tc = TrainConfig(model=args.model, model_kwargs=json.loads(args.model_kwargs),
                     loss_mode="supervised", ema_decay=0.999, num_val=8)
    trainer = Trainer(p, tc)
    path = args.ckpt or args.params_npz
    if not path:
        raise SystemExit("need --ckpt or --params-npz")
    # load_checkpoint handles both orbax dirs and slim .npz snapshots, and
    # populates ema_params (the eval-forward params when ema_decay > 0)
    trainer.load_checkpoint(path)
    print(f"model loaded [{time.time()-t0:.0f}s]", flush=True)

    def forward(coeff_f: np.ndarray) -> np.ndarray:
        """Chunked stage-1 forward -> SOLUTION coordinates, f64."""
        outs = []
        for lo in range(0, coeff_f.shape[0], args.chunk):
            cf = coeff_f[lo : lo + args.chunk]
            batch = {"coeff_f": jnp.asarray(cf, f32)}
            batch["load"] = jnp.asarray(p._train_load64(batch), f32)
            outs.append(np.asarray(
                trainer._eval_forward(trainer.state, batch, trainer.ops),
                np.float64))
        return np.concatenate(outs)

    train_cf = np.asarray(z["train_batch_coeff_f"])
    if args.num_fit:
        train_cf = train_cf[: args.num_fit]
    train_truth = np.asarray(z["train_truth"], np.float64)[: train_cf.shape[0]]
    val_cf = np.asarray(z["val_batch_coeff_f"])
    val_truth = np.asarray(z["val_truth"], np.float64)

    u0_train = forward(train_cf)
    print(f"train forward {train_cf.shape[0]} [{time.time()-t0:.0f}s]",
          flush=True)
    loads_train = p.load64({"coeff_f": train_cf})
    fit = steady_defect_fit(p, u0_train, train_truth, loads_train,
                            ridge=args.ridge, stages=args.stages)
    print(f"fit_rel={fit['fit_rel']} train_contraction="
          f"{fit['train_contraction']:.3e} [{time.time()-t0:.0f}s]",
          flush=True)

    u0_val = forward(val_cf)
    loads_val = p.load64({"coeff_f": val_cf})
    dtype = np.float32 if args.fit_dtype == "float32" else np.float64
    rec = {
        "cache": args.data_cache,
        "ckpt": args.ckpt or args.params_npz,
        "n_fit": int(train_cf.shape[0]),
        "n_val": int(val_cf.shape[0]),
        "fit_rel": fit["fit_rel"],
        "train_contraction": fit["train_contraction"],
        "inference_dtype": args.fit_dtype,
    }
    tv32 = val_truth.astype(np.float32)
    for k in range(args.stages + 1):
        t1 = time.time()
        u = (u0_val if k == 0 else apply_steady_defect_fit(
            fit, p, loads_val, u0_val, iters=k, dtype=dtype))
        errs = component_errors(
            jnp.asarray(np.asarray(u, np.float32), f32),
            jnp.asarray(tv32), p.n2)
        rec[f"stages_{k}"] = {
            **{kk: float(v) for kk, v in errs.items()},
            "wall_s": round(time.time() - t1, 2),
        }
        print(f"stages={k}:", json.dumps(rec[f"stages_{k}"]), flush=True)
        if args.out:
            with open(args.out, "w") as f:
                json.dump(rec, f, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
