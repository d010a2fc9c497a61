"""Gaussian-random-field forcing sampler + grid interpolation for CNN inputs.

Replaces the reference's scipy path:
  * RBF-kernel GRF with Cholesky sampling at the velocity DoF coordinates
    (reference: FEONet-square-with-hole/assemble_fenics.py:23-36 — length
    scale 2.0, variance 1.0, jitter 1e-8, two independent fields).
  * ``scipy.interpolate.griddata(pos_u, values, regular grid, 'cubic')``
    regridding of the unstructured field onto the CNN input grid
    (reference: FEONet-square-with-hole/create_data.py:83-99). Here the
    triangulation + barycentric weights are precomputed once on the host, so
    the per-sample interpolation is a static gather + dot under jit.

The Cholesky factor is computed once per mesh (the kernel depends only on the
DoF coordinates) and sampling is then one matmul per batch — MXU-friendly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def rbf_kernel(
    coords: Array, length_scale: float = 2.0, variance: float = 1.0
) -> np.ndarray:
    """K[i,j] = variance * exp(-|xi-xj|^2 / (2 l^2)) — host float64."""
    c = np.asarray(coords, dtype=np.float64)
    d2 = np.sum((c[:, None, :] - c[None, :, :]) ** 2, axis=-1)
    return variance * np.exp(-0.5 * d2 / (length_scale**2))


def grf_cholesky(
    coords: np.ndarray,
    length_scale: float = 2.0,
    variance: float = 1.0,
    jitter: float = 1e-8,
) -> np.ndarray:
    """Lower-triangular Cholesky factor of the jittered RBF kernel.

    Host numpy float64 unconditionally: the kernel is nearly singular at the
    reference's l=2 on a [-1,1]^2 domain — f32 Cholesky fails — and this is
    setup-time work (once per mesh; see fem/assemble.py placement rationale).
    """
    c = np.asarray(coords, dtype=np.float64)
    K = rbf_kernel(c, length_scale, variance) + jitter * np.eye(c.shape[0])
    return np.linalg.cholesky(K)


def sample_grf(
    key: Array, chol: Array, n_samples: int, dtype=np.float64
) -> tuple[np.ndarray, np.ndarray]:
    """Two independent GRF batches (u_x, u_y), each (n_samples, n_dofs).

    Matches ``generate_grf_sample`` semantics (L @ standard normal per
    component; reference: FEONet-square-with-hole/assemble_fenics.py:28-36).
    Draws come from jax.random (backend-deterministic threefry, float32 —
    exact when widened); the correlation transform runs in host float64.
    """
    chol = np.asarray(chol, dtype=np.float64)
    n = chol.shape[0]
    z = np.asarray(
        jax.random.normal(key, (2, n_samples, n), dtype=jnp.float32),
        dtype=np.float64,
    )
    fields = np.einsum("ij,kbj->kbi", chol, z)
    return fields[0].astype(dtype), fields[1].astype(dtype)


@dataclasses.dataclass(frozen=True)
class GridInterpolator:
    """Static scattered->grid interpolation plan (host-precomputed).

    Linear barycentric interpolation on the Delaunay triangulation of the
    source points; grid points outside the convex hull (or in degenerate
    simplices) get value ``fill``. The jittable replacement for griddata —
    the reference's 'cubic' differs only in smoothness of the CNN *input*
    featurization, not in any numerical-parity quantity.
    """

    vertex_ids: np.ndarray  # (n_grid, 3) int32 source-point ids
    weights: np.ndarray  # (n_grid, 3) barycentric weights
    valid: np.ndarray  # (n_grid,) bool — inside the convex hull
    resol: int
    fill: float = 0.0

    @staticmethod
    def build(
        points: np.ndarray,
        resol: int,
        lo: float = -1.0,
        hi: float = 1.0,
        fill: float = 0.0,
    ) -> "GridInterpolator":
        from scipy.spatial import Delaunay

        g = np.linspace(lo, hi, resol)
        xx, yy = np.meshgrid(g, g, indexing="ij")
        grid = np.stack([xx.ravel(), yy.ravel()], axis=1)

        tri = Delaunay(np.asarray(points, dtype=np.float64))
        simplex = tri.find_simplex(grid)
        valid = simplex >= 0
        simplex_safe = np.where(valid, simplex, 0)
        trans = tri.transform[simplex_safe]  # (n, 3, 2)
        bary2 = np.einsum(
            "nij,nj->ni", trans[:, :2, :], grid - trans[:, 2, :]
        )
        weights = np.concatenate([bary2, 1.0 - bary2.sum(axis=1, keepdims=True)], axis=1)
        vertex_ids = tri.simplices[simplex_safe].astype(np.int32)
        return GridInterpolator(
            vertex_ids=vertex_ids,
            weights=weights,
            valid=valid,
            resol=resol,
            fill=fill,
        )

    def __call__(self, values: Array) -> Array:
        """values: (..., n_points) -> (..., resol, resol)."""
        ids = jnp.asarray(self.vertex_ids)
        w = jnp.asarray(self.weights, dtype=values.dtype)
        v = jnp.asarray(self.valid)
        out = jnp.einsum("...gk,gk->...g", values[..., ids], w)
        out = jnp.where(v, out, jnp.asarray(self.fill, dtype=values.dtype))
        return out.reshape(*values.shape[:-1], self.resol, self.resol)
