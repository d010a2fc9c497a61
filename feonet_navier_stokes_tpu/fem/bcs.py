"""Dirichlet boundary conditions with dolfin-compatible facet semantics.

A DoF is constrained iff it lies on a boundary facet all of whose vertices
satisfy the subdomain predicate — dolfin's default "topological" method for
``DirichletBC`` (used throughout the reference, e.g.
FEONet_Stokes_square/assemble_fenics.py:39-54,
FEONet-square-with-hole/assemble_fenics.py:59-82,
FEONet_time_dep_Stokes/assemble_fenics.py:83-102).

Multiple BCs are applied *in order*; later ones overwrite earlier values on
shared DoFs, matching the reference's sequential ``bc.apply`` loops.

The output is a static ``BCData`` (mask + values over the ng mixed DoFs) that
the jitted assembler consumes via ``apply_bc_matrix`` / ``apply_bc_vector``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import numpy as np

from ..geometry.taylor_hood import TaylorHoodSpace

_EPS = 1e-10


@dataclasses.dataclass(frozen=True)
class BCData:
    """Static BC arrays over the canonical mixed layout [u1|u2|p]."""

    mask: np.ndarray  # (ng,) float, 1.0 where constrained
    values: np.ndarray  # (ng,) float64 BC values (0 where unconstrained)

    @property
    def indices(self) -> np.ndarray:
        return np.nonzero(self.mask > 0.5)[0]


@dataclasses.dataclass(frozen=True)
class BoundaryCondition:
    """One Dirichlet condition on a sub-space.

    field: 'u' (vector velocity, two P2 components) or 'p' (P1 pressure).
    where: predicate on vertex coordinates (n,2)->(n,) bool; a facet is
      selected iff both endpoints satisfy it.
    value: for 'u', callable (x, y) -> (f1, f2) evaluated at DoF coordinates;
      for 'p', a scalar constant or callable (x, y) -> scalar.
    """

    field: str
    where: Callable[[np.ndarray], np.ndarray]
    value: Callable | float | tuple


def _selected_p2_nodes(space: TaylorHoodSpace, where) -> np.ndarray:
    bf = space.boundary_facet_p2  # (nbf, 3): va, vb, midpoint
    verts = space.mesh.vertices
    ok = where(verts[bf[:, 0]]) & where(verts[bf[:, 1]])
    return np.unique(bf[ok].ravel())


def _selected_p1_nodes(space: TaylorHoodSpace, where) -> np.ndarray:
    bf = space.boundary_facet_p2
    verts = space.mesh.vertices
    ok = where(verts[bf[:, 0]]) & where(verts[bf[:, 1]])
    return np.unique(bf[ok][:, :2].ravel())


def make_bc(space: TaylorHoodSpace, bcs: Sequence[BoundaryCondition]) -> BCData:
    ng, n2 = space.ng, space.n2
    mask = np.zeros(ng, dtype=np.float64)
    values = np.zeros(ng, dtype=np.float64)
    for bc in bcs:
        if bc.field == "u":
            nodes = _selected_p2_nodes(space, bc.where)
            xy = space.p2_coords[nodes]
            f1, f2 = bc.value(xy[:, 0], xy[:, 1])
            f1 = np.broadcast_to(np.asarray(f1, dtype=np.float64), nodes.shape)
            f2 = np.broadcast_to(np.asarray(f2, dtype=np.float64), nodes.shape)
            mask[nodes] = 1.0
            values[nodes] = f1
            mask[n2 + nodes] = 1.0
            values[n2 + nodes] = f2
        elif bc.field == "p":
            nodes = _selected_p1_nodes(space, bc.where)
            xy = space.p1_coords[nodes]
            val = bc.value(xy[:, 0], xy[:, 1]) if callable(bc.value) else bc.value
            mask[2 * n2 + nodes] = 1.0
            values[2 * n2 + nodes] = np.broadcast_to(
                np.asarray(val, dtype=np.float64), nodes.shape
            )
        else:
            raise ValueError(f"unknown field {bc.field!r}")
    return BCData(mask=mask, values=values)


# ---------------------------------------------------------------------------
# Named BC sets for the four reference problems
# ---------------------------------------------------------------------------


def square_bcs(name: str, variant: str = "steady") -> list[BoundaryCondition]:
    """BCs on the unit square [0,1]^2.

    'lower' steady: slip (3 + 1.7 sin(2πx), 0) on y=0
      (FEONet_Stokes_square/assemble_fenics.py:41-44).
    'lower' timedep: constant (-5, 0) on y=0
      (FEONet_time_dep_Stokes/assemble_fenics.py:85-88).
    'zero': u=0 on the whole boundary (FEONet_time_dep_Stokes:90-92).
    'channel_flow': no-slip walls y∈{0,1}, p=8 at x=0, p=0 at x=1
      (FEONet_Stokes_square/assemble_fenics.py:46-54) — applied in the
      reference order [p_in, p_out, u_noslip].
    """
    if name == "lower":
        if variant == "steady":
            return [
                BoundaryCondition(
                    "u",
                    lambda v: v[:, 1] < _EPS,
                    lambda x, y: (3.0 + 1.7 * np.sin(2.0 * np.pi * x), 0.0 * x),
                )
            ]
        return [
            BoundaryCondition(
                "u", lambda v: v[:, 1] < _EPS, lambda x, y: (-5.0 + 0.0 * x, 0.0 * x)
            )
        ]
    if name == "zero":
        return [
            BoundaryCondition(
                "u", lambda v: np.ones(v.shape[0], bool), lambda x, y: (0.0 * x, 0.0 * x)
            )
        ]
    if name == "channel_flow":
        return [
            BoundaryCondition("p", lambda v: np.abs(v[:, 0]) < _EPS, 8.0),
            BoundaryCondition("p", lambda v: np.abs(v[:, 0] - 1.0) < _EPS, 0.0),
            BoundaryCondition(
                "u",
                lambda v: (np.abs(v[:, 1]) < _EPS) | (np.abs(v[:, 1] - 1.0) < _EPS),
                lambda x, y: (0.0 * x, 0.0 * x),
            ),
        ]
    raise ValueError(f"unknown square bc {name!r}")


def hole_bcs(name: str) -> list[BoundaryCondition]:
    """BCs on [-1,1]^2 minus the r=0.5 disk.

    'channel_flow' replicates the reference's literal (overlapping) predicates
    and application order [noslip, inflow, outflow, circle]
    (FEONet-square-with-hole/assemble_fenics.py:59-75):
      noslip  u=0        on boundary & (y >= 0.9 or y < 0.1)
      inflow  u=(1-y²,0) on boundary & x <= 0.1
      outflow p=0        on boundary & x >= 0.9
      circle  u=0        on the circle r=0.5
    'lower' replicates LowerBoundary's y < eps over this domain
    (assemble_fenics.py:77-82): every boundary facet with y < 0 — bottom wall,
    lower halves of the side walls and of the circle; u=(-5, 0).
    """
    if name == "channel_flow":
        return [
            BoundaryCondition(
                "u",
                lambda v: (v[:, 1] >= 0.9) | (v[:, 1] < 0.1),
                lambda x, y: (0.0 * x, 0.0 * x),
            ),
            BoundaryCondition(
                "u",
                lambda v: v[:, 0] <= 0.1,
                lambda x, y: (1.0 - y * y, 0.0 * x),
            ),
            BoundaryCondition("p", lambda v: v[:, 0] >= 0.9, 0.0),
            BoundaryCondition(
                "u",
                lambda v: np.hypot(v[:, 0], v[:, 1]) < 0.5 + 1e-6,
                lambda x, y: (0.0 * x, 0.0 * x),
            ),
        ]
    if name == "lower":
        return [
            BoundaryCondition(
                "u", lambda v: v[:, 1] < _EPS, lambda x, y: (-5.0 + 0.0 * x, 0.0 * x)
            )
        ]
    raise ValueError(f"unknown hole bc {name!r}")
