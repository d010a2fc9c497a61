"""Parametric sin/cos forcing: coefficient sampling and grid featurization.

Replicates the reference's forcing family
    f(x, y) = (m0 sin(n0 x + n1 y), m1 cos(n2 x + n3 y))
with m0, m1 ~ U(0,1) and n0..n3 ~ pi * U(0,1)
(reference: FEONet_Stokes_square/assemble_fenics.py:120-127), and the CNN
input featurization `value_f` — the forcing evaluated on a resol x resol
cartesian grid over [-1,1]^2 (reference: FEONet_Stokes_square/
train_FEONet.py:277-283, rebuilt per step there; here a pure jitted fn whose
grid constant is folded in at trace time).

Reference wart kept behind a flag: the validation set of some problem dirs
uses f = (m0 + sin(..), m1 + cos(..)) instead of m0 * sin(..)
(FEONet-square-with-hole/assemble_fenics.py:204 vs :169) — pass
``validate_form=True`` to reproduce it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _xp(x):
    """Array namespace: jnp for device arrays/tracers, numpy for host f64."""
    return jnp if isinstance(x, jax.Array) else np


def sample_sincos_coeffs(key: Array, n: int, dtype=jnp.float32) -> Array:
    """(n, 6) coefficient vectors [m0, m1, n0, n1, n2, n3].

    float32 draws by default: jax.random is backend-deterministic at f32,
    and widening to float64 for host-side load assembly is exact.
    """
    k1, k2 = jax.random.split(key)
    m = jax.random.uniform(k1, (n, 2), dtype=dtype)
    nfreq = jnp.pi * jax.random.uniform(k2, (n, 4), dtype=dtype)
    return jnp.concatenate([m, nfreq], axis=1)


def sincos_at_points(
    coeffs: Array, xy: Array, validate_form: bool = False
) -> Array:
    """Evaluate the forcing at arbitrary points.

    coeffs: (B, 6); xy: (..., 2). Returns (B, ..., 2). Works in both worlds:
    jnp under jit (grid featurization) and numpy float64 on the host
    (quadrature-point evaluation for load assembly).
    """
    xp = _xp(coeffs)
    x, y = xy[..., 0], xy[..., 1]
    extra = (1,) * x.ndim
    m0, m1, n0, n1, n2, n3 = (coeffs[:, i].reshape(-1, *extra) for i in range(6))
    s = xp.sin(n0 * x[None] + n1 * y[None])
    c = xp.cos(n2 * x[None] + n3 * y[None])
    if validate_form:
        f1, f2 = m0 + s, m1 + c
    else:
        f1, f2 = m0 * s, m1 * c
    return xp.stack([f1, f2], axis=-1)


def input_grid_points(resol: int, lo: float = -1.0, hi: float = 1.0) -> Array:
    """(resol, resol, 2) cartesian grid matching the reference's
    ``torch.cartesian_prod(linspace, linspace)`` ordering: axis 0 is x,
    axis 1 is y (train_FEONet.py:280-282)."""
    g = jnp.linspace(lo, hi, resol)
    xx, yy = jnp.meshgrid(g, g, indexing="ij")
    return jnp.stack([xx, yy], axis=-1)


def sincos_on_grid(
    coeffs: Array, resol: int, validate_form: bool = False
) -> Array:
    """CNN input tensor (B, resol, resol, 2) — NHWC, TPU-native layout.

    Same values as the reference's (B, 2, R, R) NCHW `value_f`, channels last.
    """
    xy = input_grid_points(resol)
    return sincos_at_points(jnp.asarray(coeffs), xy, validate_form=validate_form)
