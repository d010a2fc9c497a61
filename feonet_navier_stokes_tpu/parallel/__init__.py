"""Device-mesh utilities: data-parallel sharding over TPU ICI.

The reference is single-GPU (SURVEY.md §2 parallelism checklist: no
torch.distributed anywhere); here batch/ensemble data parallelism is native:
a 1-D `jax.sharding.Mesh` over all chips, batches sharded on axis 0, params
replicated — XLA inserts the psum for the loss/grad reduction."""

from .mesh import data_mesh, shard_batch, replicate, pad_to_multiple

__all__ = ["data_mesh", "shard_batch", "replicate", "pad_to_multiple"]
