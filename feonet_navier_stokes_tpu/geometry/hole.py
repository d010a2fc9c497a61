"""Unstructured mesh of the square-with-hole domain: [-1,1]^2 minus disk r=0.5.

Replaces mshr/CGAL ``generate_mesh(Rectangle(Point(-1,-1),Point(1,1)) -
Circle(Point(0,0),0.5), resolution)`` (reference:
FEONet-square-with-hole/assemble_fenics.py:48-50).

Strategy (host-side, one-time): a distmesh-style generator — quasi-uniform
seed points, explicit square/circle boundary sampling, Delaunay + Laplacian
smoothing with boundary projection, then discard triangles inside the hole.
Pure numpy: mesh generation is one-time offline setup (seconds even at
h=0.03 / 8k elements), so it stays on the host path.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import Delaunay

from .mesh import Mesh, make_mesh

_R_HOLE = 0.5


def _signed_dist(pts: np.ndarray) -> np.ndarray:
    """Signed distance to the domain boundary (negative inside the domain)."""
    d_sq = np.maximum.reduce(
        [pts[:, 0] - 1.0, -1.0 - pts[:, 0], pts[:, 1] - 1.0, -1.0 - pts[:, 1]]
    )
    d_circ = _R_HOLE - np.hypot(pts[:, 0], pts[:, 1])
    return np.maximum(d_sq, d_circ)


def _boundary_points(h: float) -> tuple[np.ndarray, np.ndarray]:
    """Fixed points on the square edges and the circle, spaced ~h."""
    n_side = max(2, int(round(2.0 / h)))
    s = np.linspace(-1.0, 1.0, n_side + 1)
    sq = np.concatenate(
        [
            np.stack([s, np.full_like(s, -1.0)], 1),
            np.stack([s, np.full_like(s, 1.0)], 1),
            np.stack([np.full_like(s[1:-1], -1.0), s[1:-1]], 1),
            np.stack([np.full_like(s[1:-1], 1.0), s[1:-1]], 1),
        ]
    )
    n_circ = max(8, int(round(2 * np.pi * _R_HOLE / h)))
    theta = np.linspace(0.0, 2 * np.pi, n_circ, endpoint=False)
    circ = _R_HOLE * np.stack([np.cos(theta), np.sin(theta)], 1)
    return sq, circ


def _valid_triangles(pts: np.ndarray, tri: np.ndarray) -> np.ndarray:
    """Keep triangles whose centroid is inside the domain."""
    cent = pts[tri].mean(axis=1)
    return tri[_signed_dist(cent) < -1e-12]


def square_with_hole_mesh(h: float = 0.125, smooth_iters: int = 60, seed: int = 0) -> Mesh:
    """Generate the square-with-hole mesh at target edge length ``h``.

    ``h ~= 0.125`` yields ~500 elements, matching the reference's
    ``generate_mesh(..., 14)`` scale (ne=482-512, ng=2549 — see
    FEONet-square-with-hole/test.ipynb problem sizes).
    """
    sq, circ = _boundary_points(h)
    fixed = np.concatenate([sq, circ], axis=0)
    # dedupe fixed points (square corners appear once by construction)
    fixed = np.unique(np.round(fixed / 1e-12) * 1e-12, axis=0)
    n_fixed = fixed.shape[0]

    # Seed interior points on a jittered triangular lattice.
    gx = np.arange(-1.0 + 0.6 * h, 1.0 - 0.3 * h, h)
    gy = np.arange(-1.0 + 0.6 * h, 1.0 - 0.3 * h, h * np.sqrt(3) / 2)
    xx, yy = np.meshgrid(gx, gy, indexing="xy")
    xx[1::2] += h / 2  # stagger rows
    pts = np.stack([xx.ravel(), yy.ravel()], 1)
    rng = np.random.default_rng(seed)
    pts = pts + 0.01 * h * rng.standard_normal(pts.shape)
    # keep interior points well away from boundaries
    pts = pts[_signed_dist(pts) < -0.45 * h]

    allpts = np.concatenate([fixed, pts], axis=0)

    # Laplacian smoothing of interior points (boundary fixed), with projection
    # of any point that drifts outside back into the domain.
    for _ in range(smooth_iters):
        tri = Delaunay(allpts).simplices
        tri = _valid_triangles(allpts, tri)
        e = np.concatenate([tri[:, [0, 1]], tri[:, [1, 2]], tri[:, [2, 0]]], axis=0)
        e = np.unique(np.sort(e, axis=1), axis=0)
        acc = np.zeros_like(allpts)
        cnt = np.zeros(allpts.shape[0])
        np.add.at(acc, e[:, 0], allpts[e[:, 1]])
        np.add.at(acc, e[:, 1], allpts[e[:, 0]])
        np.add.at(cnt, e[:, 0], 1.0)
        np.add.at(cnt, e[:, 1], 1.0)
        new = acc / np.maximum(cnt, 1.0)[:, None]
        moving = np.ones(allpts.shape[0], dtype=bool)
        moving[:n_fixed] = False
        allpts[moving] = 0.7 * allpts[moving] + 0.3 * new[moving]
        # project drifting points off the hole / outside the square
        d = _signed_dist(allpts)
        bad = moving & (d > -0.2 * h)
        if np.any(bad):
            p = allpts[bad]
            r = np.hypot(p[:, 0], p[:, 1])
            in_hole = r < (_R_HOLE + 0.2 * h)
            p[in_hole] *= ((_R_HOLE + 0.5 * h) / np.maximum(r[in_hole], 1e-9))[:, None]
            p = np.clip(p, -1.0 + 0.3 * h, 1.0 - 0.3 * h)
            allpts[bad] = p

    tri = _valid_triangles(allpts, Delaunay(allpts).simplices)
    # Drop unreferenced points (can happen for crowded seeds).
    used = np.unique(tri)
    remap = -np.ones(allpts.shape[0], dtype=np.int64)
    remap[used] = np.arange(used.size)
    return make_mesh(allpts[used], remap[tri])
