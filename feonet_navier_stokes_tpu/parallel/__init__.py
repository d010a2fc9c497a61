"""Device-mesh utilities: data-parallel and tensor-parallel sharding over
TPU ICI.

The reference is single-GPU (SURVEY.md §2 parallelism checklist: no
torch.distributed anywhere); here batch/ensemble data parallelism and
model (tensor) parallelism for the large-ng stretch configs are native:
`jax.sharding` meshes, sharding annotations on inputs/params, XLA-inserted
collectives (see mesh.py)."""

from .multihost import (
    dryrun_multihost,
    global_batch,
    init_distributed,
)
from .mesh import (
    data_mesh,
    data_model_mesh,
    model_param_shardings,
    pad_to_multiple,
    replicate,
    shard_batch,
    shard_ops,
    shard_params,
)

__all__ = [
    "data_mesh",
    "data_model_mesh",
    "model_param_shardings",
    "pad_to_multiple",
    "replicate",
    "shard_batch",
    "shard_ops",
    "shard_params",
    "dryrun_multihost",
    "global_batch",
    "init_distributed",
]
