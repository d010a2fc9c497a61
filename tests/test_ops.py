"""Pallas block-sparse operator kernel (interpret mode on the CPU suite)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feonet_navier_stokes_tpu.ops import bsr_from_dense, bsr_matmat, bsr_apply


def _banded(rng, ng, bw=35, fill=0.3):
    A = np.zeros((ng, ng), dtype=np.float32)
    i, j = np.meshgrid(np.arange(ng), np.arange(ng), indexing="ij")
    band = np.abs(i - j) <= bw
    vals = rng.standard_normal((ng, ng)).astype(np.float32)
    keep = rng.random((ng, ng)) < fill
    A[band & keep] = vals[band & keep]
    return A


def test_bsr_matches_dense():
    rng = np.random.default_rng(0)
    A = _banded(rng, 300)
    op = bsr_from_dense(jnp.asarray(A))
    assert op.density < 0.85  # banded -> off-band tiles dropped
    U = jnp.asarray(rng.standard_normal((17, 300)), dtype=jnp.float32)
    Y = bsr_matmat(U, op)
    np.testing.assert_allclose(
        np.asarray(Y), np.asarray(U) @ A.T, rtol=2e-4, atol=2e-4
    )


def test_bsr_on_real_fem_operator():
    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem

    p = build_problem(ProblemConfig(name="stokes_square", bc="channel_flow", nx=6))
    A = np.asarray(p.A64, dtype=np.float32)
    op = bsr_from_dense(jnp.asarray(A))
    b = p.sample_batch(jax.random.PRNGKey(0), 5)
    U = p.ground_truth(b).astype(jnp.float32)
    Y = bsr_matmat(U, op)
    np.testing.assert_allclose(
        np.asarray(Y), np.asarray(U) @ A.T, rtol=1e-3, atol=1e-3
    )


def test_bsr_gradient_matches_dense():
    rng = np.random.default_rng(1)
    ng = 200
    A = _banded(rng, ng, bw=25)
    op = bsr_from_dense(jnp.asarray(A))
    op_t = bsr_from_dense(jnp.asarray(A.T))
    U = jnp.asarray(rng.standard_normal((9, ng)), dtype=jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((9, ng)), dtype=jnp.float32)
    g = jax.grad(lambda u: jnp.sum((bsr_apply(u, op, op_t) - rhs) ** 2))(U)
    g_ref = jax.grad(lambda u: jnp.sum((u @ jnp.asarray(A).T - rhs) ** 2))(U)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=2e-3, atol=2e-3)


def test_bsr_padding_edge_cases():
    rng = np.random.default_rng(2)
    for ng in (100, 128, 131):  # below / exactly / above one tile
        A = _banded(rng, ng, bw=ng)
        op = bsr_from_dense(jnp.asarray(A))
        U = jnp.asarray(rng.standard_normal((3, ng)), dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(bsr_matmat(U, op)), np.asarray(U) @ A.T, rtol=2e-4, atol=2e-4
        )
