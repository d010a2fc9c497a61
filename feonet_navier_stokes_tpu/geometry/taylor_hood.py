"""Taylor-Hood (P2-P1) DoF numbering with a canonical block layout.

The mixed space W = [P2]^2 x P1 has ng = 2*n2 + n1 DoFs where n2 = #P2 nodes
(vertices + edge midpoints) and n1 = #P1 nodes (vertices).

Canonical ordering (OUR convention — the whole framework uses it end to end):

    [ u1 : 0 .. n2 ) [ u2 : n2 .. 2*n2 ) [ p : 2*n2 .. 2*n2+n1 )

with P2 nodes numbered vertices-first then edge midpoints (edges sorted by
(min_vertex, max_vertex)).  This replaces the reference's opaque FEniCS mixed
ordering and its coordinate-matching permutation reconstruction
(reference: FEONet_Stokes_square/assemble_fenics.py:74-102, validated in
FEONet_steady_Navier-Stokes/compare_ordering_nonlinear.ipynb cells 6-7).
Contiguous blocks mean the mixed operator is a plain block compose of
scalar-assembled blocks — no gathers on the hot path, which is exactly what
XLA/TPU wants.

``idx_sol = [idx_u1, idx_u2, idx_p]`` is kept for interface parity with the
reference's npz layout (FEONet_Stokes_square/assemble_fenics.py:101-102); in
our layout these are contiguous ranges.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .mesh import Mesh

# Local P2 node convention on a triangle (v0, v1, v2):
#   nodes 0..2 = vertices, node 3 = midpoint of edge (v1,v2) (opposite v0),
#   node 4 = midpoint of (v0,v2), node 5 = midpoint of (v0,v1).
_EDGE_OF_LOCAL_NODE = np.array([[1, 2], [0, 2], [0, 1]], dtype=np.int64)


@dataclasses.dataclass(frozen=True)
class TaylorHoodSpace:
    """All static numbering data the assembler and trainers need."""

    mesh: Mesh
    # P2 scalar space
    p2_coords: np.ndarray  # (n2, 2) node coordinates (vertices then midpoints)
    cell_dofs_p2: np.ndarray  # (nc, 6) int32, local convention above
    # P1 scalar space
    cell_dofs_p1: np.ndarray  # (nc, 3) int32 == mesh.cells
    # edges
    edges: np.ndarray  # (nedges, 2) int32 sorted vertex pairs
    # boundary node flags (per scalar space)
    p2_on_boundary: np.ndarray  # (n2,) bool
    p1_on_boundary: np.ndarray  # (n1,) bool
    # boundary facets with their P2 midpoint node, for predicate-based BCs
    boundary_facet_p2: np.ndarray  # (nbf, 3) int32: [v_a, v_b, midpoint_node]

    @property
    def n2(self) -> int:
        return int(self.p2_coords.shape[0])

    @property
    def n1(self) -> int:
        return int(self.mesh.num_vertices)

    @property
    def ng(self) -> int:
        return 2 * self.n2 + self.n1

    @property
    def p1_coords(self) -> np.ndarray:
        return self.mesh.vertices

    # --- canonical mixed-block index ranges (contiguous by construction) ---
    @property
    def idx_u1(self) -> np.ndarray:
        return np.arange(0, self.n2, dtype=np.int64)

    @property
    def idx_u2(self) -> np.ndarray:
        return np.arange(self.n2, 2 * self.n2, dtype=np.int64)

    @property
    def idx_p(self) -> np.ndarray:
        return np.arange(2 * self.n2, 2 * self.n2 + self.n1, dtype=np.int64)

    @property
    def idx_sol(self) -> list[np.ndarray]:
        return [self.idx_u1, self.idx_u2, self.idx_p]

    def mixed_coords(self) -> np.ndarray:
        """(ng, 2) coordinates of every mixed DoF (reference's `p = pos_all`)."""
        return np.concatenate(
            [self.p2_coords, self.p2_coords, self.p1_coords], axis=0
        )


def build_taylor_hood(mesh: Mesh) -> TaylorHoodSpace:
    cells = mesh.cells.astype(np.int64)
    nv = mesh.num_vertices

    # Unique edges, sorted by (min vertex, max vertex); midpoint node ids
    # follow the vertex block.
    all_edges = np.concatenate(
        [cells[:, [1, 2]], cells[:, [0, 2]], cells[:, [0, 1]]], axis=0
    )
    all_edges_sorted = np.sort(all_edges, axis=1)
    edges, edge_inverse = np.unique(all_edges_sorted, axis=0, return_inverse=True)
    nc = mesh.num_cells
    # all_edges rows are grouped by local node: rows [0:nc) -> local node 3, etc.
    midpoint_dof = edge_inverse.reshape(3, nc).T + nv  # (nc, 3) for nodes 3,4,5

    cell_dofs_p2 = np.concatenate([cells, midpoint_dof], axis=1).astype(np.int32)

    midpoints = 0.5 * (mesh.vertices[edges[:, 0]] + mesh.vertices[edges[:, 1]])
    p2_coords = np.concatenate([mesh.vertices, midpoints], axis=0)

    # Boundary flags & facet -> midpoint map
    bf = mesh.boundary_facets.astype(np.int64)  # already sorted pairs
    # index of each boundary facet in the unique edge list
    edge_keys = edges[:, 0] * (edges.max() + 2) + edges[:, 1]
    bf_keys = bf[:, 0] * (edges.max() + 2) + bf[:, 1]
    order = np.argsort(edge_keys)
    pos = np.searchsorted(edge_keys[order], bf_keys)
    facet_edge_idx = order[pos]
    assert np.array_equal(edges[facet_edge_idx], bf), "boundary facet lookup failed"

    p2_on_boundary = np.zeros(p2_coords.shape[0], dtype=bool)
    p2_on_boundary[bf.ravel()] = True
    p2_on_boundary[nv + facet_edge_idx] = True
    p1_on_boundary = np.zeros(nv, dtype=bool)
    p1_on_boundary[bf.ravel()] = True

    boundary_facet_p2 = np.concatenate(
        [bf.astype(np.int32), (nv + facet_edge_idx)[:, None].astype(np.int32)], axis=1
    )

    return TaylorHoodSpace(
        mesh=mesh,
        p2_coords=p2_coords,
        cell_dofs_p2=cell_dofs_p2,
        cell_dofs_p1=mesh.cells.astype(np.int32),
        edges=edges.astype(np.int32),
        p2_on_boundary=p2_on_boundary,
        p1_on_boundary=p1_on_boundary,
        boundary_facet_p2=boundary_facet_p2,
    )
