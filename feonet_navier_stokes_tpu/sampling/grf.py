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


def grf_factor(
    coords: np.ndarray,
    length_scale: float = 2.0,
    variance: float = 1.0,
    jitter: float = 1e-8,
    max_exact: int = 4000,
    n_inducing: int = 1024,
) -> np.ndarray:
    """Sampling factor F with F F^T ≈ K, scalable to ~50k DoFs.

    n <= max_exact: exact Cholesky (n, n). Larger: Nyström low-rank
    F = K_nm L_mm^{-T} over an inducing grid covering the bounding box —
    at the reference kernel (l=2 on a [-1,1]^2-scale domain) the RBF's
    numerical rank is far below 1024, so the approximation error is at
    round-off level while memory drops from O(n^2) to O(n·m)
    (the dense-Cholesky O(n^3) GRF was the scale blocker flagged in the
    round-1 review; reference kernel: FEONet-square-with-hole/
    assemble_fenics.py:23-36).
    """
    coords = np.asarray(coords, dtype=np.float64)
    n = coords.shape[0]
    if n <= max_exact:
        return grf_cholesky(coords, length_scale, variance, jitter)
    from scipy.linalg import solve_triangular

    m_side = int(np.ceil(np.sqrt(n_inducing)))
    lo, hi = coords.min(axis=0), coords.max(axis=0)
    gx = np.linspace(lo[0], hi[0], m_side)
    gy = np.linspace(lo[1], hi[1], m_side)
    xx, yy = np.meshgrid(gx, gy, indexing="ij")
    ind = np.stack([xx.ravel(), yy.ravel()], axis=1)
    Kmm = rbf_kernel(ind, length_scale, variance) + jitter * np.eye(ind.shape[0])
    Lmm = np.linalg.cholesky(Kmm)
    d2 = ((coords[:, None, :] - ind[None, :, :]) ** 2).sum(-1)
    Knm = variance * np.exp(-0.5 * d2 / length_scale**2)
    # F = K_nm L^{-T}: F F^T = K_nm K_mm^{-1} K_mn (Nyström)
    return solve_triangular(Lmm, Knm.T, lower=True).T


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
    m = chol.shape[1]  # == n for exact Cholesky; rank for the Nystrom factor
    z = np.asarray(
        jax.random.normal(key, (2, n_samples, m), dtype=jnp.float32),
        dtype=np.float64,
    )
    fields = np.einsum("ij,kbj->kbi", chol, z)
    return fields[0].astype(dtype), fields[1].astype(dtype)


@dataclasses.dataclass(frozen=True)
class GridInterpolator:
    """Static scattered->grid interpolation plan (host-precomputed).

    method='linear': barycentric interpolation on the Delaunay triangulation
    of the source points (3 gathers + weights per grid point).
    method='cubic': the reference's ``griddata(..., method='cubic')``
    (FEONet-square-with-hole/create_data.py:92-93) — a Clough-Tocher C1
    cubic spline. The CT interpolant is LINEAR in the data values (gradient
    estimation solves a linear system; Bezier coefficients are linear in
    values+gradients), so the full scattered->grid map is one dense
    (n_grid, n_points) matrix, precomputed by probing scipy's
    CloughTocher2DInterpolator with the identity — application is a single
    MXU-friendly matmul. Probing is O(n_points^2); gated to
    n_points <= _CUBIC_MAX (the reference only uses cubic at ~1k points).

    Grid points outside the convex hull (or in degenerate simplices) get
    value ``fill`` either way.
    """

    vertex_ids: np.ndarray  # (n_grid, 3) int32 source-point ids (linear)
    weights: np.ndarray  # (n_grid, 3) barycentric weights (linear)
    valid: np.ndarray  # (n_grid,) bool — inside the convex hull
    resol: int
    fill: float = 0.0
    dense_w: np.ndarray | None = None  # (n_grid, n_points) cubic CT map

    _CUBIC_MAX = 8192

    @staticmethod
    def build(
        points: np.ndarray,
        resol: int,
        lo: float = -1.0,
        hi: float = 1.0,
        fill: float = 0.0,
        method: str = "linear",
    ) -> "GridInterpolator":
        from scipy.spatial import Delaunay

        points = np.asarray(points, dtype=np.float64)
        g = np.linspace(lo, hi, resol)
        xx, yy = np.meshgrid(g, g, indexing="ij")
        grid = np.stack([xx.ravel(), yy.ravel()], axis=1)

        tri = Delaunay(points)
        simplex = tri.find_simplex(grid)
        valid = simplex >= 0
        simplex_safe = np.where(valid, simplex, 0)
        trans = tri.transform[simplex_safe]  # (n, 3, 2)
        bary2 = np.einsum(
            "nij,nj->ni", trans[:, :2, :], grid - trans[:, 2, :]
        )
        weights = np.concatenate([bary2, 1.0 - bary2.sum(axis=1, keepdims=True)], axis=1)
        vertex_ids = tri.simplices[simplex_safe].astype(np.int32)

        dense_w = None
        if method == "cubic":
            n = points.shape[0]
            if n > GridInterpolator._CUBIC_MAX:
                raise ValueError(
                    f"cubic interpolation probes an (n, n) identity — "
                    f"n_points={n} exceeds {GridInterpolator._CUBIC_MAX}; "
                    "use method='linear' at this scale"
                )
            from scipy.interpolate import CloughTocher2DInterpolator

            ct = CloughTocher2DInterpolator(tri, np.eye(n), fill_value=0.0)
            dense_w = np.asarray(ct(grid), dtype=np.float64)  # (n_grid, n)
        elif method != "linear":
            raise ValueError(f"unknown interpolation method {method!r}")
        return GridInterpolator(
            vertex_ids=vertex_ids,
            weights=weights,
            valid=valid,
            resol=resol,
            fill=fill,
            dense_w=dense_w,
        )

    def __call__(self, values: Array) -> Array:
        """values: (..., n_points) -> (..., resol, resol)."""
        v = jnp.asarray(self.valid)
        if self.dense_w is not None:
            w = jnp.asarray(self.dense_w, dtype=values.dtype)
            out = jnp.matmul(values, w.T)
        else:
            ids = jnp.asarray(self.vertex_ids)
            w = jnp.asarray(self.weights, dtype=values.dtype)
            out = jnp.einsum("...gk,gk->...g", values[..., ids], w)
        out = jnp.where(v, out, jnp.asarray(self.fill, dtype=values.dtype))
        return out.reshape(*values.shape[:-1], self.resol, self.resol)
