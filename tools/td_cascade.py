"""Resume a trained timedep checkpoint and (re-)run ONLY the cascade stage.

Exists because a full td_final run (60k stage-1 epochs) already produced a
good stage-1 checkpoint; re-running the whole job to exercise the fixed
stage-2 (resample_every=0, trainer.py cascade()) would waste an hour of TPU.

  python tools/td_cascade.py --ckpt runs/r3/td_final_ckpt/step_60000 \
      --data-cache runs/r3/td200_cache.npz --cascade-epochs 30000 \
      --log runs/r3/td_cascade.jsonl --out runs/r3/td_cascade_result.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data-cache", required=True)
    ap.add_argument("--problem", default="timedep_stokes")
    # MUST match the training run: the CLI defaults timedep problems to
    # 'five' (constant (5,-5) forcing -> load_const64), while ProblemConfig's
    # own default is 'sincos' -> load_const64 = 0. With the wrong forcing the
    # defect RHS silently contains the full constant-forcing term and
    # stage 2 learns its (deterministic, large) response: combined rel-L2
    # 0.156 reproduced to 4 digits across unrelated stage-2 runs (r3 ledger,
    # td_cascade2/3).
    ap.add_argument("--forcing", default="five")
    ap.add_argument("--nx", type=int, default=10)
    ap.add_argument("--dt", type=float, default=0.01)
    ap.add_argument("--seq-len", type=int, default=10)
    # Stage-2 loss metric. From scratch the 'physical' metric slows stage-1
    # convergence ~40x (r3 td_phys_p1: mapping the residual through
    # (S+dt·A)^{-1} reweights curvature, and the upweighted pressure
    # directions dominate early). For the DEFECT stage the calculus differs:
    # the velocity error is already ~5e-3 and the combined error floors on
    # pressure (p 0.017 vs u1 6e-4, td_cascade7) — exactly the directions
    # 'physical' + p_weight targets. Metric choice affects only the stage-2
    # objective; the frozen stage-1 forward and defect RHS are loss-free.
    ap.add_argument("--rollout-metric", default="equation",
                    choices=["equation", "physical"])
    ap.add_argument("--p-weight", type=float, default=1.0)
    # 'net'    — train a stage-2 network (default; objective per
    #            --cascade-loss-mode).
    # 'exact'  — no training: combined = stage-1 + the EXACT defect solution
    #            (Problem.defect_truth64), the timedep analog of the steady
    #            surrogate+refine_ns deployment path. Per-sample inference
    #            cost is T back-solves on the already-factorized system.
    # 'linfit' — closed-form affine stage-2 (linalg/linear_fit.py:
    #            defect_linear_fit): ridge-lstsq u_init -> defect trajectory
    #            over fresh draws. Solver-free inference; kills the pressure
    #            floor a trained stage-2 RNN leaves (p 0.017, both
    #            objectives — runs/r4/td_sup_result.json).
    # 'stepfit' — closed-form LinearStep recurrence (defect_step_fit): the
    #            defect dynamics (e_{t-1}, r_t) -> e_t is exactly linear, so
    #            one lstsq recovers the propagator; solver-free inference
    #            (matmuls only) at exact-corrector accuracy.
    ap.add_argument("--stage2", default="net",
                    choices=["net", "exact", "linfit", "stepfit"])
    ap.add_argument("--fit-samples", type=int, default=3000)
    ap.add_argument("--fit-ridge", type=float, default=1e-8)
    ap.add_argument("--fit-out", default=None,
                    help="save the fitted stage-2 W (npz) for deployment")
    # stage-2 training objective: label-free defect residual, or supervised
    # MSE against the exact defect labels (TrainConfig.cascade_loss_mode)
    ap.add_argument("--cascade-loss-mode", default="residual",
                    choices=["residual", "supervised"])
    ap.add_argument("--model", default="RNN")
    ap.add_argument("--model-kwargs", default='{"hidden":1024}')
    ap.add_argument("--num-train", type=int, default=0,
                    help=">0: slice the cached train batch (CPU re-runs "
                         "cannot afford the full 1000-sample full-batch)")
    ap.add_argument("--cascade-epochs", type=int, default=30000)
    ap.add_argument("--resample-every", type=int, default=0,
                    help=">0: fresh defect batches (via the frozen stage-1) "
                         "every N stage-2 epochs — the anti-overfit lever")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--eval-every", type=int, default=5000)
    ap.add_argument("--log", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--ckpt-dir", default=None,
                    help="save the trained STAGE-2 params here (good "
                         "cascade nets are otherwise lost with the VM)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
    from feonet_navier_stokes_tpu.train import Dataset, Trainer, TrainConfig

    p = build_problem(ProblemConfig(
        name=args.problem, bc="lower", nx=args.nx, dt=args.dt,
        forcing=args.forcing,
        seq_len=args.seq_len, equilibrate=True, precond_mode="exact",
        rollout_metric=args.rollout_metric, p_weight=args.p_weight,
    ))
    tc = TrainConfig(
        model=args.model, model_kwargs=json.loads(args.model_kwargs),
        lr=args.lr, lr_schedule="cosine", grad_clip=1.0,
        epochs=args.cascade_epochs, eval_every=args.eval_every,
        loss_mode="residual", truth_for_train=False,
        resample_every=args.resample_every,
        cascade_loss_mode=args.cascade_loss_mode,
        log_path=args.log,
    )
    trainer = Trainer(p, tc)
    # load_checkpoint handles both orbax dirs and slim params npz (the only
    # stage-1 form that survives a VM loss — orbax ckpt dirs are gitignored)
    trainer.load_checkpoint(args.ckpt)
    print(f"loaded stage-1 checkpoint {args.ckpt}", flush=True)

    z = np.load(args.data_cache, allow_pickle=True)

    def _split(prefix):
        batch = {k[len(prefix) + 7:]: jnp.asarray(z[k])
                 for k in z.files if k.startswith(prefix + "_batch_")}
        tkey = f"{prefix}_truth"
        return Dataset(batch, z[tkey] if tkey in z.files else None)

    train_ds, val_ds = _split("train"), _split("val")
    if args.num_train and args.num_train < train_ds.n:
        train_ds = Dataset(
            {k: v[: args.num_train] for k, v in train_ds.batch.items()},
            None,
        )
        print(f"sliced train batch to {args.num_train}", flush=True)
    if args.stage2 in ("exact", "linfit", "stepfit"):
        from feonet_navier_stokes_tpu.train.metrics import (
            component_errors, trajectory_rel_l2)

        pred0_val = trainer._raw_forward(val_ds.batch)
        rec = {"stage2": args.stage2}
        if args.stage2 == "exact":
            d = p.defect_batch64(val_ds.batch, pred0_val)
            corr = p.defect_truth64(d)[:, 1:]  # exact e*, (B, T, ng)
        elif args.stage2 == "stepfit":
            from feonet_navier_stokes_tpu.linalg.linear_fit import (
                apply_defect_step_fit, defect_step_fit)

            # pure lstsq (ridge=0): the step map is exactly identifiable and
            # the normal-equation ridge path squares the conditioning
            fit = defect_step_fit(trainer, n_samples=args.fit_samples)
            rec["fit_rel"] = fit["fit_rel"]
            rec["fit_samples"] = args.fit_samples
            print(f"defect_step_fit: train fit_rel={fit['fit_rel']:.3e}",
                  flush=True)
            d = p.defect_batch64(val_ds.batch, pred0_val)
            corr = apply_defect_step_fit(fit, p, d)
            if args.fit_out:
                np.savez_compressed(args.fit_out, **{
                    "W": fit["W"], "ng": np.asarray(fit["ng"])})
                print(f"saved stage-2 step map -> {args.fit_out}")
        else:
            from feonet_navier_stokes_tpu.linalg.linear_fit import (
                apply_defect_fit, defect_linear_fit)

            fit = defect_linear_fit(trainer, n_samples=args.fit_samples,
                                    ridge=args.fit_ridge)
            rec["fit_rel"] = fit["fit_rel"]
            rec["fit_samples"] = args.fit_samples
            print(f"defect_linear_fit: train fit_rel={fit['fit_rel']:.3e}",
                  flush=True)
            corr = apply_defect_fit(fit, val_ds.batch["u_init"])
            if args.fit_out:
                np.savez_compressed(args.fit_out, **{
                    "W": fit["W"], "shape": np.asarray(fit["shape"])})
                print(f"saved stage-2 affine map -> {args.fit_out}")
        combined = np.asarray(p.unmap(pred0_val)) + corr
        truth = np.asarray(val_ds.truth)
        ref = truth[:, 1: combined.shape[1] + 1]
        rec["traj_rel_l2"] = float(trajectory_rel_l2(combined, ref))
        rec.update({k: float(v) for k, v in component_errors(
            combined.reshape(-1, combined.shape[-1]),
            ref.reshape(-1, ref.shape[-1]), p.n2).items()})
        print(f"{args.stage2}-corrector combined: "
              + " ".join(f"{k}={v:.4e}" for k, v in rec.items()
                         if k not in ("stage2",)), flush=True)
    else:
        rec = trainer.cascade(train_ds, val_ds, args.cascade_epochs)
        if args.ckpt_dir:
            print("stage-2 checkpoint:",
                  trainer.stage2.save_checkpoint(args.ckpt_dir), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"ckpt": args.ckpt, "cascade_epochs": args.cascade_epochs,
                       **rec}, f, indent=1)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
