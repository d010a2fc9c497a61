"""Quadrature rules on the reference triangle {(x,y): x,y>=0, x+y<=1}.

The reference delegates quadrature to FEniCS/FFC's automatic degree estimation
(reference: FEONet_Stokes_square/assemble_fenics.py:56-70 assembles the forms,
FFC picks the rule).  All bilinear forms here have polynomial integrands of
total degree <= 4 (P2 mass), so any rule exact to that degree reproduces the
FEniCS operators to roundoff.  Load vectors with `deg_f=5` sin/cos forcing
(assemble_fenics.py:126-129) use degree >= 7.

We build collapsed (Duffy) Gauss-Legendre rules: exact for total degree
<= 2n-2 with n^2 points; simple, arbitrary-order, and a handful of points is
all these meshes need.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def triangle_quadrature(degree: int) -> tuple[np.ndarray, np.ndarray]:
    """Points (nq, 2) and weights (nq,) exact for polynomials of total degree
    <= ``degree`` on the unit reference triangle. Weights sum to area 1/2."""
    n = max(1, (degree + 2 + 1) // 2)  # 2n-2 >= degree
    x, w = np.polynomial.legendre.leggauss(n)
    x = 0.5 * (x + 1.0)  # [0,1]
    w = 0.5 * w
    xi, eta = np.meshgrid(x, x, indexing="ij")
    wx, wy = np.meshgrid(w, w, indexing="ij")
    # Duffy map: (u, v) in [0,1]^2 -> (u, v*(1-u)), Jacobian (1-u)
    pts = np.stack([xi.ravel(), (eta * (1.0 - xi)).ravel()], axis=1)
    wts = (wx * wy * (1.0 - xi)).ravel()
    return pts, wts
