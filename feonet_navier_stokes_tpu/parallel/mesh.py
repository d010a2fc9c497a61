"""1-D data mesh + sharding helpers.

Design (scaling-book recipe): pick a mesh, annotate shardings on the inputs,
let XLA insert the collectives. For this workload the model is small and the
batch is the parallel axis, so a pure data mesh rides ICI with a single
grad-psum per step; operators (ng x ng) are replicated — they are shared
constants of the residual loss.
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
