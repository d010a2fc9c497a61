"""Block-sparse (BSR) operator application as a Pallas TPU kernel.

Why: the FEM operators are banded — at the reference scales (ng <= 2.5k)
dense (ng, ng) matmuls are fine, but the ~50k-DoF stretch config
(SURVEY.md §7 step 7) makes a dense operator 10 GB and the residual matmul
HBM-bound on mostly zeros. A Taylor-Hood stiffness row has ~20-50 nonzeros,
so with 128x128 MXU tiles the operator is >95% empty at 50k DoFs.

Format: 128x128 dense tiles, only nonzero tiles stored (one extra all-zero
tile used as padding target). Per row-block, the tile column indices and
storage ids are scalar-prefetched (pltpu.PrefetchScalarGridSpec) so the
pipeline can issue the U-tile DMA for (row i, nnz k) before the body runs —
the canonical TPU block-sparse matmul pattern.

Computes Y = U @ A^T (batch-major residual application, matching
residual/losses.py conventions): Y[:, 128 i : 128(i+1)] =
    sum_k U[:, 128 c_ik : 128(c_ik+1)] @ blocks[id_ik]^T.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

BLK = 128  # MXU tile edge
B_TILE = 256  # batch tile (sublane-friendly multiple of 8)


@dataclasses.dataclass(frozen=True)
class BlockSparseOperator:
    """Static BSR operator: 128x128 tiles of a (ng, n_in) matrix.

    Square by default (n_in == ng); rectangular operators (e.g. the BPX
    congruence factor G of shape (ng, m)) set n_in/n_in_pad explicitly.
    Applied as Y = U @ A^T with U of shape (B, n_in) -> Y (B, ng)."""

    blocks: Array  # (n_stored, BLK, BLK); blocks[-1] is the zero pad tile
    block_cols: Array  # (n_row_blocks, k_max) int32 U-column-block index
    block_ids: Array  # (n_row_blocks, k_max) int32 index into `blocks`
    ng: int  # logical (unpadded) output size (matrix rows)
    ng_pad: int  # padded size = n_row_blocks * BLK
    n_in: int = -1  # logical input size (matrix cols); -1 -> ng (square)
    n_in_pad: int = -1

    def __post_init__(self):
        if self.n_in < 0:
            object.__setattr__(self, "n_in", self.ng)
            object.__setattr__(self, "n_in_pad", self.ng_pad)

    @property
    def n_row_blocks(self) -> int:
        return self.block_cols.shape[0]

    @property
    def n_col_blocks(self) -> int:
        return self.n_in_pad // BLK

    @property
    def k_max(self) -> int:
        return self.block_cols.shape[1]

    @property
    def density(self) -> float:
        real = int(jnp.sum(self.block_ids != self.blocks.shape[0] - 1))
        return real / (self.n_row_blocks * self.n_col_blocks)

    def __call__(self, u: Array) -> Array:
        return bsr_matmat(u, self)


jax.tree_util.register_pytree_node(
    BlockSparseOperator,
    lambda op: (
        (op.blocks, op.block_cols, op.block_ids),
        (op.ng, op.ng_pad, op.n_in, op.n_in_pad),
    ),
    lambda aux, leaves: BlockSparseOperator(
        blocks=leaves[0], block_cols=leaves[1], block_ids=leaves[2],
        ng=aux[0], ng_pad=aux[1], n_in=aux[2], n_in_pad=aux[3],
    ),
)


def bsr_from_dense(A: Array, tol: float = 0.0) -> BlockSparseOperator:
    """Tile a dense (ng, n_in) matrix; keep tiles with any |entry| > tol."""
    A = np.asarray(A)
    ng, n_in = A.shape
    nb = -(-ng // BLK)
    nbc = -(-n_in // BLK)
    ng_pad, n_in_pad = nb * BLK, nbc * BLK
    Ap = np.zeros((ng_pad, n_in_pad), dtype=np.float32)
    Ap[:ng, :n_in] = A
    tiles = Ap.reshape(nb, BLK, nbc, BLK).transpose(0, 2, 1, 3)  # (i, j, BLK, BLK)
    nnz_mask = np.abs(tiles).max(axis=(2, 3)) > tol  # (nb, nbc)
    k_max = max(int(nnz_mask.sum(axis=1).max()), 1)

    stored = [tiles[i, j] for i in range(nb) for j in range(nbc) if nnz_mask[i, j]]
    zero_id = len(stored)
    stored.append(np.zeros((BLK, BLK), dtype=np.float32))

    cols = np.zeros((nb, k_max), dtype=np.int32)
    ids = np.full((nb, k_max), zero_id, dtype=np.int32)
    sid = 0
    for i in range(nb):
        k = 0
        for j in range(nbc):
            if nnz_mask[i, j]:
                cols[i, k] = j
                ids[i, k] = sid
                sid += 1
                k += 1
    return BlockSparseOperator(
        blocks=jnp.asarray(np.stack(stored)),
        block_cols=jnp.asarray(cols),
        block_ids=jnp.asarray(ids),
        ng=ng,
        ng_pad=ng_pad,
        n_in=n_in,
        n_in_pad=n_in_pad,
    )


def bsr_from_csr(A_csr) -> BlockSparseOperator:
    """Build the operator from a scipy CSR matrix WITHOUT densifying.

    The memory-scalable companion of ``bsr_from_dense`` for the ~50k-DoF
    stretch configs (a dense f32 operator at ng=50k is 10 GB; the tiles of
    its ~30-nonzeros-per-row FEM stencil are ~100 MB).
    """
    from scipy.sparse import csr_matrix

    A_csr = csr_matrix(A_csr, copy=True).astype(np.float32)
    ng, n_in = A_csr.shape
    nb = -(-ng // BLK)
    nbc = -(-n_in // BLK)
    ng_pad = nb * BLK
    n_in_pad = nbc * BLK
    A_csr.resize((ng_pad, n_in_pad))
    bsr = A_csr.tobsr(blocksize=(BLK, BLK))
    bsr.sort_indices()
    data = np.ascontiguousarray(bsr.data, dtype=np.float32)  # (nnzb, BLK, BLK)
    indptr, indices = bsr.indptr, bsr.indices
    counts = np.diff(indptr)
    k_max = max(int(counts.max()), 1)
    zero_id = data.shape[0]
    blocks = np.concatenate([data, np.zeros((1, BLK, BLK), dtype=np.float32)])
    cols = np.zeros((nb, k_max), dtype=np.int32)
    ids = np.full((nb, k_max), zero_id, dtype=np.int32)
    for i in range(nb):
        lo, hi = indptr[i], indptr[i + 1]
        cols[i, : hi - lo] = indices[lo:hi]
        ids[i, : hi - lo] = np.arange(lo, hi)
    return BlockSparseOperator(
        blocks=jnp.asarray(blocks),
        block_cols=jnp.asarray(cols),
        block_ids=jnp.asarray(ids),
        ng=ng,
        ng_pad=ng_pad,
        n_in=n_in,
        n_in_pad=n_in_pad,
    )


def _bsr_kernel(cols_ref, ids_ref, u_ref, blk_ref, out_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jax.lax.dot_general(
        u_ref[:],
        blk_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),  # u @ blk^T
        preferred_element_type=jnp.float32,
        # Full f32 MXU passes: the TPU default decomposes f32 operands into
        # bfloat16 passes, flooring the Galerkin residual around 1e-3 — the
        # same reason residual/losses.py pins Precision.HIGHEST on the dense
        # path. Measured on v5e: default 2.8e-3 rel err vs dense, HIGHEST 1e-7.
        precision=jax.lax.Precision.HIGHEST,
    )


@jax.custom_vjp
def bsr_apply(u: Array, op: BlockSparseOperator, op_t: BlockSparseOperator) -> Array:
    """Differentiable Y = U @ A^T given the operator and its transpose.

    d/dU [U A^T] applied to cotangent G is G @ A = bsr_matmat(G, op_t) —
    another block-sparse product, so the backward pass never materializes a
    dense operator either. Build op_t once with
    ``bsr_from_dense(A.T)`` alongside the forward operator.
    """
    return bsr_matmat(u, op)


def _bsr_apply_fwd(u, op, op_t):
    return bsr_matmat(u, op), op_t


def _bsr_apply_bwd(op_t, g):
    return bsr_matmat(g, op_t), None, None


bsr_apply.defvjp(_bsr_apply_fwd, _bsr_apply_bwd)


@partial(jax.jit, static_argnames=("interpret",))
def _bsr_matmat_impl(u: Array, op: BlockSparseOperator, interpret: bool) -> Array:
    B, n_in = u.shape
    assert n_in == op.n_in, (n_in, op.n_in)
    b_pad = -(-B // B_TILE) * B_TILE
    u_p = jnp.zeros((b_pad, op.n_in_pad), dtype=jnp.float32)
    u_p = u_p.at[:B, :n_in].set(u.astype(jnp.float32))

    grid = (op.n_row_blocks, b_pad // B_TILE, op.k_max)
    out = pl.pallas_call(
        _bsr_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (B_TILE, BLK),
                    lambda i, j, k, cols, ids: (j, cols[i, k]),
                ),
                pl.BlockSpec(
                    (1, BLK, BLK),
                    lambda i, j, k, cols, ids: (ids[i, k], 0, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (B_TILE, BLK),
                lambda i, j, k, cols, ids: (j, i),
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, op.ng_pad), jnp.float32),
        interpret=interpret,
    )(op.block_cols, op.block_ids, u_p, op.blocks)
    return out[:B, : op.ng].astype(u.dtype)


def bsr_matmat(u: Array, op: BlockSparseOperator, interpret: bool | None = None) -> Array:
    """Y = U @ A^T for U of shape (B, n_in). Returns (B, ng).

    Runs the compiled Pallas kernel on TPU; falls back to the Pallas
    interpreter on CPU (tests / virtual-device meshes)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _bsr_matmat_impl(u, op, interpret)
