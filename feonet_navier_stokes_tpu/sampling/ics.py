"""Initial-condition samplers for the time-dependent Stokes problem.

Replicates the three IC families of the reference
(FEONet_time_dep_Stokes/assemble_fenics.py:37-68, 179-197):

  'lower':        u0 = (-5 + m0 sin(n0 x) sin(y),  m1 cos(n1 x) sin(y))
                  with m0, m1 ~ 2 + U(0,1), n0, n1 ~ 2*pi*U(0,1);
                  stored coeffs [m0, n0, m1, n1].
  'zero':         divergence-free stream-function IC
                  psi = sum_k a_k sin^2(k pi x) sin^2(l pi y),
                  u0 = (d psi/dy, -d psi/dx); k, l ~ UniformInt{1..4},
                  a ~ amp * N(0,1) * (k^2+l^2)^{-1/2}, 5 modes.
  'channel_flow': u0 = (0.1 m0 (1-y) y, 0.01 m1 sin(pi x)(1-y) y),
                  m0, m1 ~ U(0,1); stored coeffs [m0, m1].

Values are produced at arbitrary points (for L2 projection into the P2
velocity space via the mass matrix, matching FEniCS ``project``) and on the
CNN input grid (reference train featurization:
FEONet_time_dep_Stokes/train_FEONet.py:337-341, 376-385 — note the training
featurizer uses cos for the second 'lower' component while the data generator
uses cos too; both consistent here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .forcing import input_grid_points, _xp

Array = jax.Array


# ---------------------------------------------------------------------------
# Coefficient sampling
# ---------------------------------------------------------------------------


def sample_ic_coeffs(key: Array, n: int, bc: str, dtype=jnp.float32) -> Array:
    """Sample IC parameter vectors for 'lower' ((n,4): [m0,n0,m1,n1]) or
    'channel_flow' ((n,2): [m0,m1])."""
    if bc == "lower":
        k1, k2 = jax.random.split(key)
        m = 2.0 + jax.random.uniform(k1, (n, 2), dtype=dtype)
        freq = 2.0 * jnp.pi * jax.random.uniform(k2, (n, 2), dtype=dtype)
        return jnp.stack([m[:, 0], freq[:, 0], m[:, 1], freq[:, 1]], axis=1)
    if bc == "channel_flow":
        return jax.random.uniform(key, (n, 2), dtype=dtype)
    raise ValueError(f"no parametric IC family for bc={bc!r} (use stream ICs)")


def sample_stream_ic_modes(
    key: Array, n: int, n_modes: int = 5, kmax: int = 4, lmax: int = 4, amp: float = 1.0
) -> tuple[Array, Array, Array]:
    """Modes for the divergence-free stream-function IC ('zero' BC).

    Returns (ks, ls, amps), each (n, n_modes). Distribution matches
    ``random_ic_expression`` (reference: assemble_fenics.py:62-68).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    ks = jax.random.randint(k1, (n, n_modes), 1, kmax + 1)
    ls = jax.random.randint(k2, (n, n_modes), 1, lmax + 1)
    scales = (ks.astype(jnp.float32) ** 2 + ls.astype(jnp.float32) ** 2) ** -0.5
    amps = amp * jax.random.normal(k3, (n, n_modes), dtype=jnp.float32) * scales
    return ks, ls, amps


# ---------------------------------------------------------------------------
# Evaluation at points
# ---------------------------------------------------------------------------


def lower_ic_at_points(coeffs: Array, xy: Array) -> Array:
    """coeffs (B,4)=[m0,n0,m1,n1]; xy (...,2) -> (B,...,2)."""
    xp = _xp(coeffs)
    x, y = xy[..., 0], xy[..., 1]
    extra = (1,) * x.ndim
    m0, n0, m1, n1 = (coeffs[:, i].reshape(-1, *extra) for i in range(4))
    u1 = -5.0 + m0 * xp.sin(n0 * x[None]) * xp.sin(y[None])
    u2 = m1 * xp.cos(n1 * x[None]) * xp.sin(y[None])
    return xp.stack([u1, u2], axis=-1)


def channel_ic_at_points(coeffs: Array, xy: Array) -> Array:
    """coeffs (B,2)=[m0,m1]; xy (...,2) -> (B,...,2).

    (reference: assemble_fenics.py:189 — '0.1*m0*(1-y)*y',
    '0.01*m1*sin(pi*x)*(1-y)*y').
    """
    xp = _xp(coeffs)
    x, y = xy[..., 0], xy[..., 1]
    extra = (1,) * x.ndim
    m0, m1 = (coeffs[:, i].reshape(-1, *extra) for i in range(2))
    u1 = 0.1 * m0 * (1.0 - y[None]) * y[None]
    u2 = 0.01 * m1 * xp.sin(xp.pi * x[None]) * (1.0 - y[None]) * y[None]
    return xp.stack([u1, u2], axis=-1)


def stream_ic_at_points(ks: Array, ls: Array, amps: Array, xy: Array) -> Array:
    """Divergence-free IC from stream-function modes.

    ks, ls, amps: (B, n_modes); xy: (..., 2). Returns (B, ..., 2) with
    u = (d psi/dy, -d psi/dx), psi = sum a sin^2(k pi x) sin^2(l pi y).
    """
    xp = _xp(amps)
    x, y = xy[..., 0], xy[..., 1]
    extra = (1,) * x.ndim
    k = xp.asarray(ks).astype(amps.dtype).reshape(*ks.shape, *extra)  # (B, M, ...)
    l_ = xp.asarray(ls).astype(amps.dtype).reshape(*ls.shape, *extra)
    a = amps.reshape(*amps.shape, *extra)
    xb, yb = x[None, None], y[None, None]
    sx, cx = xp.sin(k * xp.pi * xb), xp.cos(k * xp.pi * xb)
    sy, cy = xp.sin(l_ * xp.pi * yb), xp.cos(l_ * xp.pi * yb)
    ux = xp.sum(a * 2.0 * sx * sx * sy * cy * l_ * xp.pi, axis=1)
    uy = xp.sum(a * (-2.0) * sx * cx * sy * sy * k * xp.pi, axis=1)
    return xp.stack([ux, uy], axis=-1)


# ---------------------------------------------------------------------------
# CNN-grid featurization (64 x 64 over [-1,1]^2, reference train closure)
# ---------------------------------------------------------------------------


def lower_ic_on_grid(coeffs: Array, resol: int = 64) -> Array:
    """(B, resol, resol, 2) NHWC input for UNet2D/UNetTemporal models."""
    return lower_ic_at_points(jnp.asarray(coeffs), input_grid_points(resol))


def channel_ic_on_grid(coeffs: Array, resol: int = 64) -> Array:
    return channel_ic_at_points(jnp.asarray(coeffs), input_grid_points(resol))
