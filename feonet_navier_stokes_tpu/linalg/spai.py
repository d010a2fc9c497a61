"""SPAI (sparse-approximate-inverse) preconditioner as a jitted matmul loop.

The reference runs this iteration in scipy.sparse on CPU at 4-31 it/s
(reference: FEONet_Stokes_square/train_FEONet.py:104-131; throughput from
FEONet_Stokes_square/test.ipynb cell 4, FEONet-square-with-hole/test.ipynb
cell 30). The iteration is three dense matmuls + two reductions — ideal MXU
work — so here it is one ``lax.scan`` under jit:

    alpha_0 = 2 / ||A A^T||_1,  M_0 = alpha_0 A
    repeat m times:
        G = I - A M
        AG = A G
        alpha = tr(G^T AG) / ||AG||_F^2
        M <- M + alpha G

The reference estimates ||A A^T||_1 with scipy's onenormest; we use the exact
1-norm (max absolute column sum) — same fixed point, the initial alpha only
affects early iterates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _spai_impl(A: Array, m: int) -> Array:
    n = A.shape[0]
    eye = jnp.eye(n, dtype=A.dtype)
    one_norm = jnp.max(jnp.sum(jnp.abs(A @ A.T), axis=0))
    M0 = (2.0 / one_norm) * A

    def step(M, _):
        G = eye - A @ M
        AG = A @ G
        # tr(G^T AG) = sum(G * AG) — no explicit n x n product for the trace.
        alpha = jnp.sum(G * AG) / jnp.sum(AG * AG)
        return M + alpha * G, None

    M, _ = jax.lax.scan(step, M0, None, length=m)
    return M


_spai_jit = jax.jit(_spai_impl, static_argnums=1)


def spai(A: Array, m: int) -> Array:
    """m iterations of the SPAI fixed-point; returns the approximate inverse M
    such that cond(A @ M) ~ 1 (reference cond numbers: BASELINE.md)."""
    return _spai_jit(jnp.asarray(A), int(m))


def condition_number(A: Array) -> float:
    """2-norm condition number via SVD (reference: np.linalg.cond,
    train_FEONet.py:101, 138)."""
    s = jnp.linalg.svd(jnp.asarray(A, dtype=jnp.float64), compute_uv=False)
    return float(s[0] / s[-1])
