"""Lagrange P1/P2 shape functions on the reference triangle.

Replaces FEniCS's FIAT-tabulated 'CG' elements
(reference: FEONet_Stokes_square/assemble_fenics.py:33-35 —
``VectorElement('CG', triangle, 2) * FiniteElement('CG', triangle, 1)``).

Local P2 node convention (matches geometry/taylor_hood.py):
  0,1,2 = vertices; 3 = midpoint of edge (1,2); 4 = midpoint of (0,2);
  5 = midpoint of (0,1).
"""

from __future__ import annotations

import numpy as np

P1_DIM = 3
P2_DIM = 6


def p1_basis(pts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """P1 values (nq, 3) and reference gradients (nq, 3, 2) at ``pts``."""
    xi, eta = pts[:, 0], pts[:, 1]
    lam = np.stack([1.0 - xi - eta, xi, eta], axis=1)
    grad = np.broadcast_to(
        np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]]), (pts.shape[0], 3, 2)
    ).copy()
    return lam, grad


def p2_basis(pts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """P2 values (nq, 6) and reference gradients (nq, 6, 2) at ``pts``."""
    lam, dlam = p1_basis(pts)  # (nq,3), (nq,3,2)
    l0, l1, l2 = lam[:, 0], lam[:, 1], lam[:, 2]
    vals = np.stack(
        [
            l0 * (2 * l0 - 1),
            l1 * (2 * l1 - 1),
            l2 * (2 * l2 - 1),
            4 * l1 * l2,
            4 * l0 * l2,
            4 * l0 * l1,
        ],
        axis=1,
    )
    d0, d1, d2 = dlam[:, 0], dlam[:, 1], dlam[:, 2]  # (nq, 2) each

    def g(i_lam, coeff):  # gradient of coeff * lam_i
        return coeff[:, None] * {0: d0, 1: d1, 2: d2}[i_lam]

    grads = np.stack(
        [
            (4 * l0 - 1)[:, None] * d0,
            (4 * l1 - 1)[:, None] * d1,
            (4 * l2 - 1)[:, None] * d2,
            4 * (l2[:, None] * d1 + l1[:, None] * d2),
            4 * (l2[:, None] * d0 + l0[:, None] * d2),
            4 * (l1[:, None] * d0 + l0[:, None] * d1),
        ],
        axis=1,
    )
    return vals, grads
