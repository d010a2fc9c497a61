"""Pallas TPU kernels for the hot compute paths."""

from .block_sparse import (
    BlockSparseOperator,
    bsr_from_dense,
    bsr_from_csr,
    bsr_matmat,
    bsr_apply,
)

__all__ = [
    "BlockSparseOperator",
    "bsr_from_dense",
    "bsr_from_csr",
    "bsr_matmat",
    "bsr_apply",
]
