"""Device meshes + sharding helpers: data parallel, and tensor (model)
parallel for the large-ng stretch configs.

Design (scaling-book recipe): pick a mesh, annotate shardings on the inputs,
let XLA insert the collectives.

* **Data parallel** (the default mapping for this workload class — tiny
  model, large sample ensembles): 1-D ``('data',)`` mesh, batch axis sharded,
  params/operators replicated, one grad-psum per step over ICI.
* **Tensor parallel** (the ~50k-DoF stretch, where the coefficient head
  ``Dense(filters·R², ng)`` is ~150M params — 600 MB f32, 2.4 GB with Adam):
  2-D ``('data', 'model')`` mesh. The head kernel is ROW-sharded over
  ``'model'`` (Megatron row-parallel: shard the input-feature axis, which is
  ``filters·R²`` — a power-of-two-friendly product, unlike the FEM DoF count
  ``ng``, which is almost never divisible by the axis size); each device
  contracts its feature slice and XLA inserts one all-reduce producing the
  replicated (B, ng) prediction. Dense residual operators are additionally
  row-sharded ``P('model', None)`` when ng divides the axis, splitting the
  residual matmul too. Optimizer state inherits the param shardings through
  propagation, cutting per-device param+moment memory by the model-axis size.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = Any


def data_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def data_model_mesh(model_axis: int, n_devices: int | None = None) -> Mesh:
    """2-D ('data', 'model') mesh: `model_axis` devices on the model axis,
    the rest on data. The model axis is innermost so tensor-parallel
    collectives ride the fastest ICI hops."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % model_axis != 0:
        raise ValueError(f"{n} devices not divisible by model_axis={model_axis}")
    grid = np.asarray(devs).reshape(n // model_axis, model_axis)
    return Mesh(grid, ("data", "model"))


def model_param_shardings(params, mesh: Mesh, ng: int):
    """Per-leaf NamedShardings: row-shard every coefficient-head KERNEL
    (2-D leaf whose last axis == ng — ng never collides with a conv filter
    count) over its input-feature axis; replicate everything else (including
    the (ng,) bias — tiny, and ng rarely divides the axis size)."""
    m = mesh.shape["model"]

    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) == 2 and shape[-1] == ng:
            if shape[0] % m != 0:
                raise ValueError(
                    f"tensor parallelism needs the head input dim {shape[0]} "
                    f"(filters * resol^2) divisible by model_axis={m}"
                )
            return NamedSharding(mesh, P("model", None))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, params)


def shard_params(params, mesh: Mesh, ng: int):
    """Place a param pytree with the model-parallel layout."""
    return jax.tree.map(
        lambda p, s: jax.device_put(p, s),
        params,
        model_param_shardings(params, mesh, ng),
    )


def shard_ops(ops: dict, mesh: Mesh):
    """Place the operator pytree for tensor parallelism: dense (ng, ng)
    operators row-sharded over 'model' when ng divides the axis size (each
    device then applies its row block to the replicated prediction); Pallas
    BSR operator pairs rebuilt as row-block-sharded
    ShardedBlockSparseOperators (per-device operator memory and residual
    FLOPs both / model-axis); everything else — vectors, masks, the BPX
    congruence factor (both directions are primal ops; kept replicated) —
    replicated."""
    import jax.numpy as jnp

    m = mesh.shape["model"]
    repl = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P("model", None))

    def place(leaf):
        if (
            isinstance(leaf, jnp.ndarray)
            and leaf.ndim == 2
            and leaf.shape[0] == leaf.shape[1]
            and leaf.shape[0] % m == 0
        ):
            return jax.device_put(leaf, row)
        return jax.device_put(leaf, repl)

    out = {}
    for k, v in ops.items():
        if isinstance(v, tuple):
            if k == "bpx_G":
                out[k] = jax.device_put(v, repl)
            else:
                from ..ops.block_sparse import bsr_to_csr, sharded_bsr_from_csr

                fwd = v[0]
                csr = bsr_to_csr(fwd)[: fwd.ng, : fwd.n_in].tocsr()
                out[k] = sharded_bsr_from_csr(csr, mesh)
        else:
            out[k] = place(v)
    return out


def pad_to_multiple(x: Array, m: int, axis: int = 0) -> Array:
    """Pad axis length to a multiple of m by repeating the last element
    (padding samples only add redundant residual terms)."""
    n = x.shape[axis]
    rem = (-n) % m
    if rem == 0:
        return x
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (0, rem)
    return np.asarray(jax.numpy.pad(x, pad_width, mode="edge"))


def shard_batch(batch: dict[str, Array], mesh: Mesh, axis: str = "data") -> dict[str, Array]:
    """Place each (B, ...) array with its leading axis sharded over the mesh.

    Batches whose leading axis is not divisible by the mesh size are padded by
    repeating the last sample (padding only adds redundant residual terms to
    the loss mean; metrics are computed on the unpadded eval path)."""
    sh = NamedSharding(mesh, P(axis))
    m = mesh.devices.size
    return {k: jax.device_put(pad_to_multiple(v, m), sh) for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state/operators) over the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)
