"""Surrogate-warm-started steady-NS truth generation (bootstrap loop).

Cold stable-branch generation (tools/add_train_truth.py) costs ~8 s/sample
at ne=450: the relaxed-Picard / IMEX march spends most of its iterations
getting from the Stokes solution into the root's basin. A trained surrogate
skips that march: predict, then damped-Newton refine on the same weak
system (problems/base.py:refine_ns) — the pattern validated by
runs/r2/ns450_refine_eval.json (surrogate 0.057 -> 4.8e-6 in 8 steps, 0/200
wrong roots vs the stable truth).

Guards (labels must stay on the stable branch):
  * residual: accept only rel_res < --tol (default 1e-9, same as
    sample_converged);
  * root identity: reject samples whose refined root moved further than
    --dist-tol relative distance from the prediction (a wrong-root jump is
    O(1); surrogate error is ~0.05-0.2);
  * rejects fall back to the COLD batched stable solve; samples that still
    fail are resampled (the reference's own policy,
    FEONet_steady_Navier-Stokes/assemble_fenics.py:239-241).

Output npz is add_train_truth-compatible (grows train_batch_* +
train_truth, fingerprint tracks the count) so ns_run.py consumes it
directly. Uses its own PRNG stream (--key-base 50000) disjoint from
build_ns_cache (5/10) and add_train_truth (5000+).

  JAX_PLATFORM_NAME=cpu python tools/gen_warm.py \
      --ckpt runs/r2c/ns450_unet600_ckpt/step_30000 --model UNetWithHead \
      --base runs/r2/ns450_stable6k.npz --out runs/r2/ns450_stable6k.npz \
      --target 6000 --chunk 100
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
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--base", required=True, help="existing cache npz")
    ap.add_argument("--out", required=True)
    ap.add_argument("--target", type=int, default=6000)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--key-base", type=int, default=50000)
    ap.add_argument("--nx", type=int, default=15)
    ap.add_argument("--bc", default="lower")
    ap.add_argument("--equilibrate", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--precond-mode", default="exact")
    ap.add_argument("--stokes-shift", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--op-format", default="dense", choices=["dense", "bsr"],
                    help="bsr: the ~50k-DoF stretch path (sparse CSR-Jacobian "
                         "refine + sparse cold fallback); forces equilibrate/"
                         "stokes-shift off and precond off (a dense inverse "
                         "is impossible at that scale)")
    ap.add_argument("--bpx-levels", type=int, default=0,
                    help="surrogate trained in BPX w-coordinates (network "
                         "emits w, u = G w + u_bc) — required to load such "
                         "a checkpoint (d_out = m, not ng)")
    ap.add_argument("--model", default="UNetWithHead")
    ap.add_argument("--model-kwargs", default="{}")
    ap.add_argument("--steps", type=int, default=12, help="max Newton steps")
    ap.add_argument("--tol", type=float, default=1e-9)
    ap.add_argument("--dist-tol", type=float, default=0.5)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORM_NAME"])
    import jax.numpy as jnp

    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
    from feonet_navier_stokes_tpu.train import Trainer, TrainConfig

    t0 = time.time()
    if args.op_format == "bsr":
        pc = ProblemConfig(
            name="steady_ns", bc=args.bc, nx=args.nx, ns_branch="stable",
            op_format="bsr", bpx_levels=args.bpx_levels,
        )
    else:
        pc = ProblemConfig(
            name="steady_ns", bc=args.bc, nx=args.nx, ns_branch="stable",
            equilibrate=args.equilibrate, precond_mode=args.precond_mode,
            stokes_shift=args.stokes_shift, bpx_levels=args.bpx_levels,
        )
    p = build_problem(pc)
    tc = TrainConfig(model=args.model,
                     model_kwargs=json.loads(args.model_kwargs),
                     loss_mode="supervised", num_val=1)
    trainer = Trainer(p, tc)
    trainer.load_checkpoint(args.ckpt)
    print(f"problem + surrogate ready [{time.time()-t0:.0f}s]", flush=True)

    src = args.out if os.path.isfile(args.out) else args.base
    z = np.load(src, allow_pickle=True)
    base_fp = json.loads(str(z["fingerprint"]))
    data = {k: np.asarray(z[k]) for k in z.files if k != "fingerprint"}
    if "train_truth" not in data:
        # fresh start from a label-free base: pre-existing train_batch_*
        # rows have no labels — keeping them would misalign loads and truth
        # (mirrors add_train_truth.py's stale-key cleanup)
        stale = [k for k in data if k.startswith("train_batch_")]
        for k in stale:
            del data[k]
        if stale:
            print(f"dropped {len(stale)} unlabeled train_batch_* keys from "
                  f"the base", flush=True)
    n_have = data["train_truth"].shape[0] if "train_truth" in data else 0
    # Resume must NOT restart the PRNG stream (re-drawing keys key_base+0..
    # appends duplicate samples): restore the persisted chunk counter, or
    # conservatively skip past n_have//chunk keys for pre-fix caches.
    chunk_i = int(base_fp.get("gen_warm_chunk_i", -(-n_have // args.chunk)))
    print(f"resuming from {src}: {n_have} supervised train samples "
          f"(chunk_i={chunk_i})", flush=True)

    def save(n_total: int) -> None:
        fp = dict(base_fp, num_train=int(n_total), train_truth=True,
                  gen_warm_chunk_i=int(chunk_i))
        tmp = args.out + ".tmp.npz"
        np.savez(tmp, fingerprint=np.asarray(json.dumps(fp, sort_keys=True)),
                 **data)
        os.replace(tmp, args.out)
    stats = {"warm_ok": 0, "cold_ok": 0, "resampled": 0}
    while n_have < args.target:
        n = min(args.chunk, args.target - n_have)
        t1 = time.time()
        key = jax.random.PRNGKey(args.key_base + chunk_i)
        chunk_i += 1
        batch = p.sample_batch(key, n)
        pred = np.asarray(
            trainer._eval_forward(trainer.state, batch, trainer.ops),
            np.float64)
        u, rel = p.refine_ns(pred, batch, steps=args.steps, tol=args.tol)
        dist = (np.linalg.norm(u - pred, axis=1)
                / np.maximum(np.linalg.norm(u, axis=1), 1e-30))
        ok = (rel < args.tol) & (dist < args.dist_tol)
        stats["warm_ok"] += int(ok.sum())
        bad = np.nonzero(~ok)[0]
        if bad.size:
            # cold fallback on the rejects (batched stable solve)
            load64 = p.load64({k: np.asarray(v)[bad] for k, v in batch.items()})
            uc, rc, _ = p._solve_ns_batch(load64)
            cold_ok = rc < args.tol
            u[bad[cold_ok]] = uc[cold_ok]
            ok[bad[cold_ok]] = True
            stats["cold_ok"] += int(cold_ok.sum())
            stats["resampled"] += int((~cold_ok).sum())
        idx = np.nonzero(ok)[0]
        for k, v in batch.items():
            bk = f"train_batch_{k}"
            v = np.asarray(v)[idx]
            data[bk] = (v if bk not in data
                        else np.concatenate([data[bk], v], axis=0))
        truth = u[idx]
        data["train_truth"] = (truth if "train_truth" not in data
                               else np.concatenate(
                                   [data["train_truth"], truth], axis=0))
        n_have += len(idx)
        save(n_have)
        print(f"{n_have}/{args.target} [+{len(idx)} in {time.time()-t1:.0f}s"
              f" | rel_max {rel.max():.1e} dist_max {dist.max():.2f}"
              f" cold {stats['cold_ok']} resampled {stats['resampled']}]"
              f" -> {args.out}", flush=True)
    print("done", json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
