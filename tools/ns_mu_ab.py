"""A/B: the reference's half-viscosity NS ground truth vs the self-consistent
one (VERDICT round-1 item 8 / weak 5).

The reference's steady-NS data generator solves the TRUE weak form with
viscosity 0.5*mu while its training system assembles mu
(FEONet_steady_Navier-Stokes/assemble_fenics.py:192 vs :88 — an upstream
wart, likely a dropped grad-transpose). This repo's default solves the
self-consistent system (ns_truth_mu_factor=1.0). This tool quantifies the
delta on the ne=450 config:

  * rel-L2 distance between the two truths themselves, and
  * a trained model's rel-L2 against EACH truth (model from --ckpt, e.g.
    the runs/r2/ns450_ckpt hybrid run).

CPU-only (host f64 Newton + forward): run with JAX_PLATFORM_NAME=cpu.
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
    ap.add_argument("--data-cache", default="runs/r2/ns450_data.npz")
    ap.add_argument("--ckpt", default=None,
                    help="trained checkpoint (model config must match "
                         "--model/--model-kwargs)")
    ap.add_argument("--model", default="Net2D")
    ap.add_argument("--model-kwargs", default='{"filters": 16}')
    ap.add_argument("--equilibrate", action="store_true")
    ap.add_argument("--precond", type=int, default=0)
    ap.add_argument("--precond-mode", default="spai",
                    choices=["spai", "exact"])
    ap.add_argument("--stokes-shift", action="store_true")
    ap.add_argument("--bpx-levels", type=int, default=0,
                    help="match a BPX-trained checkpoint (w-coordinate unmap)")
    ap.add_argument("--ns-branch", default="newton",
                    choices=["newton", "stable"])
    ap.add_argument("--op-format", default="dense", choices=["dense", "bsr"],
                    help="bsr at the ~47k stretch scale (a dense 47k^2 "
                         "operator cannot be materialized); implies no "
                         "equilibrate/precond, matching stretch_run ckpts")
    ap.add_argument("--nx", type=int, default=15)
    ap.add_argument("--bc", default="lower")
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--reuse-cache-truth", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="use the cache's val_truth as the mu_factor=1.0 arm "
                         "(build_ns_cache solves exactly that system for "
                         "exactly these samples) instead of re-solving it — "
                         "halves the host-f64 cost at the 47k scale")
    ap.add_argument("--chunk", type=int, default=24,
                    help="solve the halved-mu arm in chunks of this many "
                         "samples, writing a partial --out after each (a "
                         "killed run still leaves n_done-sample evidence); "
                         "0 = one batch")
    ap.add_argument("--out", default="runs/r2/ns_mu_ab.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
    from feonet_navier_stokes_tpu.train.metrics import component_errors

    t0 = time.time()
    base = dict(name="steady_ns", bc=args.bc, nx=args.nx,
                equilibrate=args.equilibrate, precond_iters=args.precond,
                ns_branch=args.ns_branch, op_format=args.op_format)
    # p10 carries the full TRAINING config so --ckpt unmaps correctly;
    # p05 is truth-only (its training coordinates are never used)
    p10 = build_problem(ProblemConfig(**base, ns_truth_mu_factor=1.0,
                                      precond_mode=args.precond_mode,
                                      stokes_shift=args.stokes_shift,
                                      bpx_levels=args.bpx_levels))
    p05 = build_problem(ProblemConfig(**base, ns_truth_mu_factor=0.5))

    z = np.load(args.data_cache, allow_pickle=True)
    n_val = int(np.asarray(z["val_batch_coeff_f"]).shape[0])
    if args.n > n_val:  # ADVICE r4: over-asking produced a rel10/u10 shape
        print(f"clamping --n {args.n} -> cache val size {n_val}", flush=True)
        args.n = n_val  # mismatch at the final mask
    coeff_f = np.asarray(z["val_batch_coeff_f"])[: args.n]
    batch = {"coeff_f": jnp.asarray(coeff_f, jnp.float32)}
    load64 = p10.load64(batch)
    # training-coordinate loads: shift_output (stokes_shift) consumes them
    batch["load"] = jnp.asarray(p10._train_load64(batch), jnp.float32)
    if args.reuse_cache_truth and "fingerprint" not in z.files:
        # ADVICE r4: only build_ns_cache-era caches (fingerprinted) carry a
        # sample_converged val_truth; the r2 damped-Newton cache does not —
        # reusing it would assert rel=0 for possibly-unconverged truths
        print("cache has no fingerprint (pre-sample_converged era): "
              "re-solving the mu_factor=1.0 arm instead of reusing",
              flush=True)
        args.reuse_cache_truth = False
    if args.reuse_cache_truth and "val_truth" in z.files:
        # build_ns_cache's val_truth IS the mu_factor=1.0 stable-branch
        # solve of these exact samples (sample_converged enforced rel<tol)
        u10 = np.asarray(z["val_truth"], np.float64)[: args.n]
        rel10 = np.zeros(args.n)
        print(f"mu_factor=1.0 arm reused from cache val_truth "
              f"[{time.time()-t0:.0f}s]", flush=True)
    else:
        print(f"solving {args.n} instances under mu_factor=1.0 "
              f"[{time.time()-t0:.0f}s]", flush=True)
        u10, rel10, _ = p10._solve_ns_batch(load64)

    def _partial(n_done, delta):
        res = {
            "config": f"steady_ns nx={args.nx} {args.bc}, "
                      f"{n_done}/{args.n} samples (partial)",
            "truth_delta_rel_l2_(mu05_vs_mu10)": {
                k: float(v) for k, v in delta.items()
            },
        }
        if args.out:
            with open(args.out, "w") as f:
                json.dump(res, f, indent=1)

    chunk = args.chunk or args.n
    u05_parts, rel05_parts = [], []
    for lo in range(0, args.n, chunk):
        hi = min(args.n, lo + chunk)
        print(f"solving mu_factor=0.5 arm [{lo}:{hi}) "
              f"[{time.time()-t0:.0f}s]", flush=True)
        uc, rc, _ = p05._solve_ns_batch(load64[lo:hi])
        u05_parts.append(uc)
        rel05_parts.append(rc)
        okp = (np.concatenate(rel05_parts) < 1e-8) & (rel10[:hi] < 1e-8)
        dp = component_errors(
            jnp.asarray(np.concatenate(u05_parts)[okp]),
            jnp.asarray(u10[:hi][okp]), p10.n2)
        _partial(hi, dp)
    u05 = np.concatenate(u05_parts)
    rel05 = np.concatenate(rel05_parts)
    ok = (rel10 < 1e-8) & (rel05 < 1e-8)
    u10, u05 = u10[ok], u05[ok]
    print(f"{int(ok.sum())}/{args.n} converged under both", flush=True)

    delta = component_errors(jnp.asarray(u05), jnp.asarray(u10), p10.n2)
    result = {
        "config": f"steady_ns nx={args.nx} {args.bc}, {int(ok.sum())} samples",
        "truth_delta_rel_l2_(mu05_vs_mu10)": {
            k: float(v) for k, v in delta.items()
        },
    }

    if args.ckpt:
        from feonet_navier_stokes_tpu.train import Trainer, TrainConfig

        tc = TrainConfig(model=args.model,
                         model_kwargs=json.loads(args.model_kwargs),
                         num_train=4, num_val=4, data_parallel=False,
                         ema_decay=0.999)
        tr = Trainer(p10, tc)
        tr.load_checkpoint(args.ckpt)
        pred = np.asarray(p10.unmap(tr._raw_forward(
            {k: v[jnp.asarray(np.flatnonzero(ok))] for k, v in batch.items()}
        )))
        for name, truth in (("mu_factor_1.0", u10), ("mu_factor_0.5", u05)):
            errs = component_errors(jnp.asarray(pred), jnp.asarray(truth),
                                    p10.n2)
            result[f"model_rel_l2_vs_{name}"] = {
                k: float(v) for k, v in errs.items()
            }

    print(json.dumps(result, indent=1), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
