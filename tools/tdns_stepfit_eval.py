"""Unsteady-NS solver-free defect corrector: fit + eval (VERDICT r4 Next#3).

Loads a trained timedep_ns stage-1 checkpoint (RNN trajectory surrogate),
fits the exact defect step map g -> e (= (S + dt A)^{-1}, identifiable to
machine precision because the IMEX scheme is linear given the previous
state — linalg/ns_corrector.py:tdns_step_fit) from one labeled batch, and
evaluates the f32 corrector rollout on fresh held-out samples. Inference is
stage-1 forward + per-step einsums/matmuls: no solver.

  python tools/tdns_stepfit_eval.py --nx 10 --ckpt-dir /root/ck/tdns200 \
      --model RNN --model-kwargs '{"hidden": 512}' \
      --out runs/r5/tdns200_stepfit_result.json

Reference anchor: FEONet_time_dep_Stokes/train_FEONet.py:343-406 (the
reference has no unsteady Navier-Stokes at all — BASELINE.json config 5 is
a stretch config beyond it).
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
    ap.add_argument("--nx", type=int, default=10)
    ap.add_argument("--bc", default="lower")
    ap.add_argument("--forcing", default="five")
    ap.add_argument("--dt", type=float, default=0.01)
    ap.add_argument("--seq-len", type=int, default=10)
    ap.add_argument("--model", default="RNN")
    ap.add_argument("--model-kwargs", default='{"hidden": 512}')
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--ckpt-dir", default=None,
                    help="use the latest checkpoint in this dir")
    ap.add_argument("--n-fit", type=int, default=400)
    ap.add_argument("--n-val", type=int, default=200)
    ap.add_argument("--ridge", type=float, default=0.0)
    ap.add_argument("--seed-fit", type=int, default=9300)
    ap.add_argument("--seed-val", type=int, default=9400)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
    from feonet_navier_stokes_tpu.train import Trainer, TrainConfig
    from feonet_navier_stokes_tpu.train.metrics import (component_errors,
                                                        trajectory_rel_l2)
    from feonet_navier_stokes_tpu.linalg.ns_corrector import (
        apply_tdns_step_fit, tdns_step_fit)

    t0 = time.time()
    p = build_problem(ProblemConfig(
        name="timedep_ns", bc=args.bc, forcing=args.forcing, nx=args.nx,
        dt=args.dt, seq_len=args.seq_len,
    ))
    tc = TrainConfig(model=args.model, model_kwargs=json.loads(args.model_kwargs),
                     loss_mode="supervised", ema_decay=0.999, num_val=8)
    trainer = Trainer(p, tc)
    ckpt = args.ckpt
    if ckpt is None and args.ckpt_dir:
        ckpt = trainer.latest_checkpoint(args.ckpt_dir)
    if ckpt is None:
        raise SystemExit("need --ckpt or --ckpt-dir with checkpoints")
    trainer.load_checkpoint(ckpt)
    print(f"loaded {ckpt} [{time.time()-t0:.0f}s]", flush=True)

    def forward_phys(batch) -> np.ndarray:
        pred = trainer._eval_forward(trainer.state, batch, trainer.ops)
        return np.asarray(pred, np.float64)  # (B, T, ng) physical

    fit_batch = p.sample_batch(jax.random.PRNGKey(args.seed_fit), args.n_fit)
    u0_fit = forward_phys(fit_batch)
    fit = tdns_step_fit(p, fit_batch, u0_fit, ridge=args.ridge)
    print(f"fit_rel={fit['fit_rel']:.3e} [{time.time()-t0:.0f}s]", flush=True)

    val_batch = p.sample_batch(jax.random.PRNGKey(args.seed_val), args.n_val)
    truth = p.ground_truth(val_batch, n_steps=args.seq_len)
    u0_val = forward_phys(val_batch)
    corr = apply_tdns_step_fit(fit, p, val_batch, u0_val)  # f32

    t32 = truth[:, 1:].astype(np.float32)
    raw_traj = float(trajectory_rel_l2(u0_val.astype(np.float32), t32))
    cor_traj = float(trajectory_rel_l2(corr, t32))
    raw_c = component_errors(jnp.asarray(u0_val.reshape(-1, p.ng), jnp.float32),
                             jnp.asarray(t32.reshape(-1, p.ng)), p.n2)
    cor_c = component_errors(jnp.asarray(corr.reshape(-1, p.ng)),
                             jnp.asarray(t32.reshape(-1, p.ng)), p.n2)
    rec = {
        "problem": f"timedep_ns nx={args.nx} (ng={p.ng}) {args.bc} "
                   f"{args.forcing}, dt={args.dt}, T={args.seq_len}",
        "ckpt": ckpt,
        "n_fit": args.n_fit,
        "n_val": args.n_val,
        "fit_rel": fit["fit_rel"],
        "stage1_traj_rel_l2": raw_traj,
        "stepfit_traj_rel_l2": cor_traj,
        "stage1": {k: float(v) for k, v in raw_c.items()},
        "stepfit": {k: float(v) for k, v in cor_c.items()},
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(rec), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
