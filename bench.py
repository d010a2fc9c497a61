"""Benchmark harness: full residual-loss train step at the 512-element config.

Prints ONE JSON line:
  {"metric": "train_steps_per_sec_512dof", "value": N, "unit": "steps/s",
   "vs_baseline": N}

Measured workload — one full training step (forcing featurization -> Net2D
forward -> Galerkin residual loss -> backward -> Adam update) at the
reference's ne=512 scale:
  * mesh nx=16 unit square -> ne=512 elements, ng=2563 mixed DoFs (the same
    size as the reference's square-with-hole ne=512 / ng=2549 headline config,
    FEONet-square-with-hole/test.ipynb cells 14-16),
  * full batch 1000 samples (reference BATCH_SIZE=NUM_DATA=1000,
    FEONet_Stokes_square/train_FEONet.py:99-102),
  * Net2D(filters=32, k=5) on a 20x20 forcing grid (the reference's default
    resol_in=20, train_FEONet.py:40).

Baseline — the reference's own train-step code pattern (per-sample mm
list-comprehension + per-DoF Python MSE loop + Adam,
FEONet_Stokes_square/train_FEONet.py:261-301) run in torch on the CPU of
this image at the identical (ng=2563, B=1000, R=20) configuration. The
reference repo commits no GPU training logs (log/ is gitignored,
.gitignore:96-99), so the in-image CPU measurement is the only reproducible
baseline; re-measure with tools/measure_baseline.py.
"""

from __future__ import annotations

import json
import sys
import time

# Measured in-image (torch 2.x CPU, ng=2563, B=1000, R=20) with
# tools/measure_baseline.py on 2026-08-16: 18.4 s/step warm (at the
# reference's hole-problem R=50 the same pattern takes 271.6 s/step).
BASELINE_STEPS_PER_SEC = 1.0 / 18.4


def measure_tpu_steps_per_sec(
    nx: int = 16, batch: int = 1000, resol: int = 50, warm_steps: int = 30
) -> float:
    import jax

    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
    from feonet_navier_stokes_tpu.train import Trainer, TrainConfig

    problem = build_problem(
        ProblemConfig(name="stokes_square", bc="channel_flow", nx=nx, resol_in=resol)
    )
    tc = TrainConfig(
        model="Net2D",
        lr=1e-3,
        num_train=batch,
        num_val=1,
        model_kwargs={"filters": 32, "kernel_size": 5},
    )
    trainer = Trainer(problem, tc)
    batch_d = problem.sample_batch(jax.random.PRNGKey(5), batch)
    if trainer.mesh is not None:
        from feonet_navier_stokes_tpu.parallel import shard_batch

        batch_d = shard_batch(batch_d, trainer.mesh)

    rng = jax.random.PRNGKey(1)
    # compile + 3 warm-up steps
    for _ in range(3):
        rng, k = jax.random.split(rng)
        trainer.state, loss = trainer._train_step(trainer.state, batch_d, k)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for _ in range(warm_steps):
        rng, k = jax.random.split(rng)
        trainer.state, loss = trainer._train_step(trainer.state, batch_d, k)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    assert float(loss) == float(loss), "NaN loss in benchmark"
    return warm_steps / dt


def main() -> int:
    baseline = BASELINE_STEPS_PER_SEC
    value = measure_tpu_steps_per_sec()
    print(
        json.dumps(
            {
                "metric": "train_steps_per_sec_512dof",
                "value": round(value, 3),
                "unit": "steps/s",
                "vs_baseline": round(value / baseline, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
