"""Multi-host (multi-process) scaffold: DCN-ready distributed initialization
and a 2-process CPU dryrun.

The reference is single-process/single-GPU (SURVEY.md §2: no
torch.distributed anywhere); the survey's parallelism checklist names "DCN
for multi-host later" as the one axis beyond single-host ICI. This module is
that scaffold:

* ``init_distributed`` wraps ``jax.distributed.initialize`` — on TPU pods
  the coordinator/process-count/process-id are auto-detected from the
  environment, on CPU/GPU fleets they are passed explicitly.
* After initialization every process sees the GLOBAL device set, the
  existing ``data_mesh``/``data_model_mesh`` builders span hosts
  transparently (device order keeps each host's devices contiguous, so the
  innermost mesh axes ride ICI and only the outer data axis crosses DCN),
  and ``global_batch`` constructs globally-sharded arrays from host-local
  data.
* ``dryrun_multihost(n)`` spawns n coordinator+worker processes on a
  virtual CPU mesh (Gloo collectives) and runs ONE full sharded train step
  in each, verifying the cross-process psum agrees — the same
  self-provisioning recipe as ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import os
import subprocess
import sys


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize multi-process JAX. On TPU pods call with no arguments
    (auto-detection); elsewhere pass coordinator ('host:port') + counts."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_batch(batch: dict, mesh, axis: str = "data") -> dict:
    """Build globally-sharded batch arrays from identical host-local data.

    Every process holds the full batch on host (samplers are seeded
    identically); each contributes only its addressable shards.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(axis))
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def _worker(process_id: int, num_processes: int, port: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    init_distributed(f"localhost:{port}", num_processes, process_id)
    import jax.numpy as jnp

    from ..problems import ProblemConfig, build_problem
    from ..train import Trainer, TrainConfig
    from .mesh import data_mesh

    n_local = jax.local_device_count()
    n_global = jax.device_count()
    assert n_global == num_processes * n_local, (n_global, num_processes, n_local)

    problem = build_problem(
        ProblemConfig(name="stokes_square", bc="channel_flow", nx=4)
    )
    trainer = Trainer(
        problem,
        TrainConfig(
            model="Net2D", num_train=2 * n_global, num_val=2,
            data_parallel=False, model_kwargs={"filters": 4},
        ),
    )
    mesh = data_mesh()  # spans ALL processes' devices
    raw_batch = problem.sample_batch(jax.random.PRNGKey(0), 2 * n_global)
    batch = global_batch(raw_batch, mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    state = jax.device_put(trainer.state, repl)
    ops = jax.device_put(trainer.ops, repl)
    state, loss = trainer._train_step(state, batch, jax.random.PRNGKey(1), ops)
    loss = float(jax.block_until_ready(loss))
    assert jnp.isfinite(loss), loss
    print(
        f"multihost worker {process_id}/{num_processes}: "
        f"global devices={n_global} DP train step OK, loss={loss:.6e}",
        flush=True,
    )

    # TP variant: 2-D (data, model) mesh spanning processes — the head
    # all-reduce crosses the process boundary (device order keeps each
    # host's devices contiguous, so 'model' stays intra-host when
    # n_local % 2 == 0, the ICI-inner/DCN-outer layout)
    if n_global % 2 == 0:
        tp_trainer = Trainer(
            problem,
            TrainConfig(
                model="Net2D", num_train=2 * n_global, num_val=2,
                model_axis=2, model_kwargs={"filters": 4},
            ),
        )
        kernel_spec = tp_trainer.state.params["Dense_0"]["kernel"].sharding.spec
        assert kernel_spec[0] == "model", kernel_spec
        tp_batch = global_batch(raw_batch, tp_trainer.mesh)
        _, tp_loss = tp_trainer._train_step(
            tp_trainer.state, tp_batch, jax.random.PRNGKey(2), tp_trainer.ops
        )
        tp_loss = float(jax.block_until_ready(tp_loss))
        assert jnp.isfinite(tp_loss), tp_loss
        print(
            f"multihost worker {process_id}/{num_processes}: "
            f"global devices={n_global} TP train step OK, loss={tp_loss:.6e}",
            flush=True,
        )


def dryrun_multihost(
    n_processes: int = 2, devices_per_process: int = 4, timeout: int = 600
) -> list[str]:
    """Spawn ``n_processes`` CPU processes (each with a virtual
    ``devices_per_process``-device mesh), run one globally-sharded train
    step in each, and check every process computed the SAME loss (the
    cross-host grad psum went through Gloo). Returns the worker stdout
    lines."""
    import socket

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devices_per_process}"
    )
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m",
                "feonet_navier_stokes_tpu.parallel.multihost",
                str(pid), str(n_processes), str(port),
            ],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(n_processes)
    ]
    outs = []
    for pid, proc in enumerate(procs):
        out, _ = proc.communicate(timeout=timeout)
        outs.append(out)
        if proc.returncode != 0:
            raise RuntimeError(
                f"multihost worker {pid} failed (rc={proc.returncode}):\n{out}"
            )
    lines = [
        line for out in outs for line in out.splitlines()
        if line.startswith("multihost worker")
    ]
    # every process must report the SAME loss per layout (DP and TP lines)
    for kind in ("DP", "TP"):
        kind_lines = [l for l in lines if f"{kind} train step" in l]
        losses = {l.split("loss=")[1] for l in kind_lines}
        assert len(losses) <= 1, (
            f"processes disagree on the global {kind} loss: {kind_lines}"
        )
        if kind == "DP":
            assert kind_lines, f"no DP lines in worker output: {lines}"
    for line in lines:
        print(line)
    return lines


if __name__ == "__main__":
    _worker(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
