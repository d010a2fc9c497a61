"""Block-sparse (BSR) operator application as a Pallas TPU kernel.

Why: the FEM operators are banded — at the reference scales (ng <= 2.5k)
dense (ng, ng) matmuls are fine, but the ~50k-DoF stretch config
(SURVEY.md §7 step 7) makes a dense operator 10 GB and the residual matmul
HBM-bound on mostly zeros. A Taylor-Hood stiffness row has ~20-50 nonzeros,
so with 128x128 MXU tiles the operator is >95% empty at 50k DoFs.

Format: 128x128 dense tiles, only nonzero tiles stored, streamed in CSR
order as FLAT per-tile index arrays (tile_row / tile_col / tile_id /
tile_first). The grid iterates over stored tiles only — not over a padded
(n_row_blocks, k_max) table — which matters twice on real TPUs:

  * SMEM: the scalar-prefetch tables are O(n_stored_tiles), not
    O(n_row_blocks * k_max). The BPX congruence operator (linalg/bpx.py)
    has k_max=257 (its coarsest-level rows are dense) — the padded layout
    needs 1.4 MB of SMEM against the 1 MB budget and fails to compile; the
    flat layout needs ~240 KB.
  * compute: no zero-padded tile iterations — the BPX operator runs ~8x
    fewer grid steps than the padded layout would.

Consecutive tiles of one row-block accumulate into the same output tile
(tile_first flags the zero-init), the canonical Pallas revisiting pattern;
per-tile index maps are scalar-prefetched (pltpu.PrefetchScalarGridSpec) so
the pipeline issues each tile's DMA ahead of the body.

Computes Y = U @ A^T (batch-major residual application, matching
residual/losses.py conventions). Operators may be rectangular (ng, n_in) —
e.g. the BPX factor G — applied to U of shape (B, n_in).
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

    Tiles are streamed in CSR (row-major) order; every row-block has at
    least one entry (empty row-blocks get one reference to the trailing
    zero tile so their output is zero-initialized)."""

    blocks: Array  # (n_stored + 1, BLK, BLK); blocks[-1] is the zero tile
    tile_row: Array  # (n_steps,) int32 output row-block index
    tile_col: Array  # (n_steps,) int32 U column-block index
    tile_id: Array  # (n_steps,) int32 index into `blocks`
    tile_first: Array  # (n_steps,) int32, 1 at the first tile of a row-block
    ng: int  # logical (unpadded) output size (matrix rows)
    ng_pad: int
    n_in: int = -1  # logical input size (matrix cols); -1 -> ng (square)
    n_in_pad: int = -1

    def __post_init__(self):
        if self.n_in < 0:
            object.__setattr__(self, "n_in", self.ng)
            object.__setattr__(self, "n_in_pad", self.ng_pad)

    @property
    def n_row_blocks(self) -> int:
        return self.ng_pad // BLK

    @property
    def n_col_blocks(self) -> int:
        return self.n_in_pad // BLK

    @property
    def n_steps(self) -> int:
        return self.tile_row.shape[0]

    @property
    def density(self) -> float:
        real = int(jnp.sum(self.tile_id != self.blocks.shape[0] - 1))
        return real / (self.n_row_blocks * self.n_col_blocks)

    def __call__(self, u: Array) -> Array:
        return bsr_matmat(u, self)


jax.tree_util.register_pytree_node(
    BlockSparseOperator,
    lambda op: (
        (op.blocks, op.tile_row, op.tile_col, op.tile_id, op.tile_first),
        (op.ng, op.ng_pad, op.n_in, op.n_in_pad),
    ),
    lambda aux, leaves: BlockSparseOperator(
        blocks=leaves[0], tile_row=leaves[1], tile_col=leaves[2],
        tile_id=leaves[3], tile_first=leaves[4],
        ng=aux[0], ng_pad=aux[1], n_in=aux[2], n_in_pad=aux[3],
    ),
)


def _flat_layout(nb: int, indptr, indices):
    """CSR block structure -> flat (row, col, id, first) streams with a
    zero-tile entry for every empty row-block (id = n_stored)."""
    n_stored = int(indptr[-1])
    rows, cols, ids, firsts = [], [], [], []
    for i in range(nb):
        lo, hi = int(indptr[i]), int(indptr[i + 1])
        if hi == lo:  # empty row-block: one zero-tile step to init output
            rows.append([i])
            cols.append([0])
            ids.append([n_stored])
            firsts.append([1])
        else:
            rows.append([i] * (hi - lo))
            cols.append(list(indices[lo:hi]))
            ids.append(list(range(lo, hi)))
            firsts.append([1] + [0] * (hi - lo - 1))
    cat = lambda x: np.asarray(sum(x, []), dtype=np.int32)
    return cat(rows), cat(cols), cat(ids), cat(firsts)


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
    stored = [tiles[i, j] for i in range(nb) for j in range(nbc) if nnz_mask[i, j]]
    stored.append(np.zeros((BLK, BLK), dtype=np.float32))
    counts = nnz_mask.sum(axis=1)
    indptr = np.concatenate([[0], np.cumsum(counts)])
    indices = np.concatenate(
        [np.flatnonzero(nnz_mask[i]) for i in range(nb)]
    ) if counts.sum() else np.zeros(0, dtype=np.int64)
    row, col, ids, first = _flat_layout(nb, indptr, indices)
    return BlockSparseOperator(
        blocks=jnp.asarray(np.stack(stored)),
        tile_row=jnp.asarray(row),
        tile_col=jnp.asarray(col),
        tile_id=jnp.asarray(ids),
        tile_first=jnp.asarray(first),
        ng=ng, ng_pad=ng_pad, n_in=n_in, n_in_pad=n_in_pad,
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
    ng_pad, n_in_pad = nb * BLK, nbc * BLK
    A_csr.resize((ng_pad, n_in_pad))
    bsr = A_csr.tobsr(blocksize=(BLK, BLK))
    bsr.sort_indices()
    data = np.ascontiguousarray(bsr.data, dtype=np.float32)  # (nnzb, BLK, BLK)
    blocks = np.concatenate([data, np.zeros((1, BLK, BLK), dtype=np.float32)])
    row, col, ids, first = _flat_layout(nb, bsr.indptr, bsr.indices)
    return BlockSparseOperator(
        blocks=jnp.asarray(blocks),
        tile_row=jnp.asarray(row),
        tile_col=jnp.asarray(col),
        tile_id=jnp.asarray(ids),
        tile_first=jnp.asarray(first),
        ng=ng, ng_pad=ng_pad, n_in=n_in, n_in_pad=n_in_pad,
    )


def _bsr_kernel(row_ref, col_ref, id_ref, first_ref, u_ref, blk_ref, out_ref):
    t = pl.program_id(1)

    @pl.when(first_ref[t] == 1)
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
    ``bsr_from_csr(A.T)`` alongside the forward operator.
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

    # t (stored-tile stream) is the INNER grid dim: consecutive tiles of one
    # row-block accumulate into the same output tile before it is flushed.
    grid = (b_pad // B_TILE, op.n_steps)
    out = pl.pallas_call(
        _bsr_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (B_TILE, BLK),
                    lambda j, t, row, col, ids, first: (j, col[t]),
                ),
                pl.BlockSpec(
                    (1, BLK, BLK),
                    lambda j, t, row, col, ids, first: (ids[t], 0, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (B_TILE, BLK),
                lambda j, t, row, col, ids, first: (j, row[t]),
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, op.ng_pad), jnp.float32),
        interpret=interpret,
    )(op.tile_row, op.tile_col, op.tile_id, op.tile_first, u_p, op.blocks)
    return out[:B, : op.ng].astype(u.dtype)


def bsr_matmat(u: Array, op: BlockSparseOperator, interpret: bool | None = None) -> Array:
    """Y = U @ A^T for U of shape (B, n_in). Returns (B, ng).

    Runs the compiled Pallas kernel on TPU; falls back to the Pallas
    interpreter on CPU (tests / virtual-device meshes)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _bsr_matmat_impl(u, op, interpret)


# ---------------------------------------------------------------------------
# Tensor-parallel (row-block-sharded) BSR operators
# ---------------------------------------------------------------------------


def bsr_to_csr(op: BlockSparseOperator):
    """Reconstruct the (padded-shape) scipy CSR matrix from a BSR operator.

    Stored tiles appear in the flat stream in CSR order with consecutive ids
    (both builders guarantee this); zero-tile steps (empty row-blocks) are
    skipped. Host-side, used once when sharding operators for tensor
    parallelism."""
    from scipy.sparse import bsr_matrix

    blocks = np.asarray(op.blocks)
    n_stored = blocks.shape[0] - 1
    ids = np.asarray(op.tile_id)
    rows = np.asarray(op.tile_row)
    cols = np.asarray(op.tile_col)
    real = ids != n_stored
    counts = np.bincount(rows[real], minlength=op.n_row_blocks)
    indptr = np.concatenate([[0], np.cumsum(counts)])
    mat = bsr_matrix(
        (blocks[:n_stored], cols[real], indptr),
        shape=(op.ng_pad, op.n_in_pad),
    )
    return mat.tocsr()


@dataclasses.dataclass(frozen=True)
class ShardedBlockSparseOperator:
    """Row-block-sharded BSR operator for tensor parallelism (VERDICT item:
    TP previously replicated BSR operators, so the model axis cut only
    head/optimizer memory).

    The row-blocks of A are partitioned into ``m`` contiguous shards over the
    mesh's model axis; each device stores only its shard's tiles (operator
    memory / m) and computes its row slice of Y = U @ A^T from the replicated
    U (residual FLOPs / m). Forward: shard_map, out-specs concatenate the row
    slices over 'model'. Backward: each device applies its shard's transpose
    to its cotangent slice and the partials are psum'd over 'model' — no
    dense operator, no full-size per-device matmul anywhere.

    Stacked arrays carry a leading shard axis of size m (streams padded to
    the longest shard with no-op steps that keep accumulating zeros into the
    shard's last row-block)."""

    f_blocks: Array  # (m, nb_f + 1, BLK, BLK)
    f_row: Array  # (m, s_f)
    f_col: Array
    f_id: Array
    f_first: Array
    b_blocks: Array  # (m, nb_b + 1, BLK, BLK) — per-shard transpose
    b_row: Array  # (m, s_b)
    b_col: Array
    b_id: Array
    b_first: Array
    ng: int  # logical output rows of A
    n_in: int  # logical input size
    n_in_pad: int
    rows_pad: int  # per-shard padded output rows (m * rows_pad >= ng)
    mesh: Any  # jax.sharding.Mesh (static)
    axis: str = "model"
    data_axis: str = "data"

    @property
    def m(self) -> int:
        return self.f_blocks.shape[0]

    def __call__(self, u: Array) -> Array:
        return sharded_bsr_apply(u, self)


jax.tree_util.register_pytree_node(
    ShardedBlockSparseOperator,
    lambda op: (
        (op.f_blocks, op.f_row, op.f_col, op.f_id, op.f_first,
         op.b_blocks, op.b_row, op.b_col, op.b_id, op.b_first),
        (op.ng, op.n_in, op.n_in_pad, op.rows_pad, op.mesh, op.axis,
         op.data_axis),
    ),
    lambda aux, leaves: ShardedBlockSparseOperator(*leaves, *aux),
)


def _pad_shard_ops(ops: list[BlockSparseOperator]):
    """Stack per-shard operators, padding blocks and streams to the longest.

    Stream padding appends steps that accumulate the zero tile into the
    shard's LAST row-block (no revisit of flushed output tiles, no effect on
    values). Block padding appends zero tiles after each shard's own zero
    tile, so stored ids stay valid."""
    nb_max = max(o.blocks.shape[0] for o in ops)
    s_max = max(o.n_steps for o in ops)

    def pad_one(o: BlockSparseOperator):
        blocks = np.asarray(o.blocks)
        blocks = np.concatenate(
            [blocks, np.zeros((nb_max - blocks.shape[0], BLK, BLK), np.float32)]
        )
        pad = s_max - o.n_steps
        zero_id = np.asarray(o.blocks).shape[0] - 1
        row = np.concatenate([np.asarray(o.tile_row),
                              np.full(pad, o.n_row_blocks - 1, np.int32)])
        col = np.concatenate([np.asarray(o.tile_col), np.zeros(pad, np.int32)])
        ids = np.concatenate([np.asarray(o.tile_id),
                              np.full(pad, zero_id, np.int32)])
        first = np.concatenate([np.asarray(o.tile_first), np.zeros(pad, np.int32)])
        return blocks, row, col, ids, first

    parts = [pad_one(o) for o in ops]
    stack = lambda i: jnp.asarray(np.stack([p[i] for p in parts]))
    return stack(0), stack(1), stack(2), stack(3), stack(4)


def sharded_bsr_from_csr(
    A_csr, mesh, axis: str = "model", data_axis: str = "data"
) -> ShardedBlockSparseOperator:
    """Partition a scipy CSR matrix into row-block shards over ``axis``."""
    from scipy.sparse import csr_matrix

    A = csr_matrix(A_csr).astype(np.float32)
    ng, n_in = A.shape
    m = mesh.shape[axis]
    nb = -(-ng // BLK)
    nb_per = -(-nb // m)
    rows_pad = nb_per * BLK
    n_in_pad = -(-n_in // BLK) * BLK
    A_full = csr_matrix(A, copy=True)
    A_full.resize((m * rows_pad, n_in_pad))
    f_ops, b_ops = [], []
    for k in range(m):
        Ak = A_full[k * rows_pad : (k + 1) * rows_pad]
        f_ops.append(bsr_from_csr(Ak))
        b_ops.append(bsr_from_csr(Ak.T.tocsr()))
    f = _pad_shard_ops(f_ops)
    b = _pad_shard_ops(b_ops)
    return ShardedBlockSparseOperator(
        *f, *b,
        ng=ng, n_in=n_in, n_in_pad=n_in_pad, rows_pad=rows_pad,
        mesh=mesh, axis=axis, data_axis=data_axis,
    )


def _local_op(blocks, row, col, ids, first, ng, ng_pad, n_in, n_in_pad):
    return BlockSparseOperator(
        blocks=blocks, tile_row=row, tile_col=col, tile_id=ids,
        tile_first=first, ng=ng, ng_pad=ng_pad, n_in=n_in, n_in_pad=n_in_pad,
    )


@jax.custom_vjp
def sharded_bsr_apply(u: Array, sop: ShardedBlockSparseOperator) -> Array:
    """Differentiable Y = U @ A^T with A row-block-sharded over the model
    axis. u: (B, n_in) replicated over 'model' (sharded over 'data');
    returns (B, ng) in the same layout."""
    return _sharded_fwd_impl(u, sop)


def _sharded_fwd_impl(u, sop):
    from jax.sharding import PartitionSpec as P

    mesh = sop.mesh
    d = sop.data_axis if sop.data_axis in mesh.shape else None

    def local(u_loc, blocks, row, col, ids, first):
        op = _local_op(
            blocks[0], row[0], col[0], ids[0], first[0],
            ng=sop.rows_pad, ng_pad=sop.rows_pad,
            n_in=sop.n_in, n_in_pad=sop.n_in_pad,
        )
        return bsr_matmat(u_loc, op)

    y = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(d, None), P(sop.axis), P(sop.axis), P(sop.axis),
                  P(sop.axis), P(sop.axis)),
        out_specs=P(d, sop.axis),
        check_vma=False,
    )(u, sop.f_blocks, sop.f_row, sop.f_col, sop.f_id, sop.f_first)
    return y[:, : sop.ng]


def _sharded_bwd_impl(g, sop):
    from jax.sharding import PartitionSpec as P

    mesh = sop.mesh
    d = sop.data_axis if sop.data_axis in mesh.shape else None
    m = sop.m
    g_pad = jnp.zeros((g.shape[0], m * sop.rows_pad), dtype=g.dtype)
    g_pad = g_pad.at[:, : sop.ng].set(g)

    def local(g_loc, blocks, row, col, ids, first):
        op_t = _local_op(
            blocks[0], row[0], col[0], ids[0], first[0],
            ng=sop.n_in, ng_pad=sop.n_in_pad,
            n_in=sop.rows_pad, n_in_pad=sop.rows_pad,
        )
        part = bsr_matmat(g_loc, op_t)  # (B_loc, n_in)
        return jax.lax.psum(part, sop.axis)

    du = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(d, sop.axis), P(sop.axis), P(sop.axis), P(sop.axis),
                  P(sop.axis), P(sop.axis)),
        out_specs=P(d, None),
        check_vma=False,
    )(g_pad, sop.b_blocks, sop.b_row, sop.b_col, sop.b_id, sop.b_first)
    return du


def _sharded_apply_fwd(u, sop):
    return _sharded_fwd_impl(u, sop), sop


def _sharded_apply_bwd(sop, g):
    return _sharded_bwd_impl(g, sop), None


sharded_bsr_apply.defvjp(_sharded_apply_fwd, _sharded_apply_bwd)
