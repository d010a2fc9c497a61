"""Pallas TPU kernels for the hot compute paths."""

from .block_sparse import (
    BlockSparseOperator,
    ShardedBlockSparseOperator,
    bsr_from_dense,
    bsr_from_csr,
    bsr_matmat,
    bsr_apply,
    bsr_to_csr,
    sharded_bsr_from_csr,
    sharded_bsr_apply,
)

__all__ = [
    "BlockSparseOperator",
    "ShardedBlockSparseOperator",
    "bsr_from_dense",
    "bsr_from_csr",
    "bsr_matmat",
    "bsr_apply",
    "bsr_to_csr",
    "sharded_bsr_from_csr",
    "sharded_bsr_apply",
]
