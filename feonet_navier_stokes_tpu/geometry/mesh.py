"""Triangle meshes (host-side construction, numpy; consumed by jitted FEM kernels).

Replaces the reference's mesh layer:
  * dolfin ``RectangleMesh(Point(0,0), Point(1,1), n, n)``
    (reference: FEONet_Stokes_square/assemble_fenics.py:30)
  * mshr ``generate_mesh(Rectangle - Circle, 14)``
    (reference: FEONet-square-with-hole/assemble_fenics.py:48-50) — see hole.py.

Mesh construction is a one-time host-side step; everything downstream
(assembly, residuals, training) is jitted JAX. numpy + int32 index arrays are
the natural representation here.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class Mesh:
    """An unstructured conforming triangle mesh.

    Attributes:
      vertices: (nv, 2) float64 vertex coordinates.
      cells: (nc, 3) int32 vertex indices per triangle, counter-clockwise.
      boundary_facets: (nbf, 2) int32 vertex-index pairs of boundary edges
        (edges adjacent to exactly one cell).
    """

    vertices: np.ndarray
    cells: np.ndarray
    boundary_facets: np.ndarray

    @property
    def num_vertices(self) -> int:
        return int(self.vertices.shape[0])

    @property
    def num_cells(self) -> int:
        return int(self.cells.shape[0])

    def cell_vertices(self) -> np.ndarray:
        """(nc, 3, 2) coordinates of each cell's vertices."""
        return self.vertices[self.cells]


def _orient_ccw(vertices: np.ndarray, cells: np.ndarray) -> np.ndarray:
    """Flip cells with negative signed area so all are counter-clockwise."""
    v = vertices[cells]
    det = (v[:, 1, 0] - v[:, 0, 0]) * (v[:, 2, 1] - v[:, 0, 1]) - (
        v[:, 1, 1] - v[:, 0, 1]
    ) * (v[:, 2, 0] - v[:, 0, 0])
    cells = cells.copy()
    flip = det < 0
    cells[flip] = cells[flip][:, [0, 2, 1]]
    return cells


def extract_boundary_facets(cells: np.ndarray) -> np.ndarray:
    """Edges referenced by exactly one triangle, as (nbf, 2) vertex pairs."""
    edges = np.concatenate(
        [cells[:, [0, 1]], cells[:, [1, 2]], cells[:, [2, 0]]], axis=0
    )
    key = np.sort(edges, axis=1)
    _, inv, counts = np.unique(key, axis=0, return_inverse=True, return_counts=True)
    boundary = counts[inv] == 1
    return np.ascontiguousarray(np.sort(edges[boundary], axis=1).astype(np.int32))


def make_mesh(vertices: np.ndarray, cells: np.ndarray) -> Mesh:
    vertices = np.asarray(vertices, dtype=np.float64)
    cells = _orient_ccw(vertices, np.asarray(cells, dtype=np.int32))
    return Mesh(
        vertices=vertices,
        cells=cells,
        boundary_facets=extract_boundary_facets(cells),
    )


def structured_rectangle(
    nx: int,
    ny: int,
    p0: tuple[float, float] = (0.0, 0.0),
    p1: tuple[float, float] = (1.0, 1.0),
    diagonal: str = "right",
) -> Mesh:
    """Structured triangulation of an axis-aligned rectangle.

    Matches the cell layout of dolfin's ``RectangleMesh`` (2 triangles per
    quad). ``diagonal='right'`` splits each quad by the lower-left -> upper-right
    diagonal, ``'left'`` by the other one, ``'crossed'`` adds the center vertex
    (4 triangles per quad).
    """
    x = np.linspace(p0[0], p1[0], nx + 1)
    y = np.linspace(p0[1], p1[1], ny + 1)
    xx, yy = np.meshgrid(x, y, indexing="xy")
    vertices = np.stack([xx.ravel(), yy.ravel()], axis=1)

    def vid(i, j):  # i in [0,nx], j in [0,ny]
        return j * (nx + 1) + i

    cells = []
    if diagonal in ("right", "left"):
        for j in range(ny):
            for i in range(nx):
                v00, v10 = vid(i, j), vid(i + 1, j)
                v01, v11 = vid(i, j + 1), vid(i + 1, j + 1)
                if diagonal == "right":
                    cells.append([v00, v10, v11])
                    cells.append([v00, v11, v01])
                else:
                    cells.append([v00, v10, v01])
                    cells.append([v10, v11, v01])
    elif diagonal == "crossed":
        centers = []
        base = vertices.shape[0]
        for j in range(ny):
            for i in range(nx):
                cx = 0.5 * (x[i] + x[i + 1])
                cy = 0.5 * (y[j] + y[j + 1])
                centers.append([cx, cy])
                c = base + j * nx + i
                v00, v10 = vid(i, j), vid(i + 1, j)
                v01, v11 = vid(i, j + 1), vid(i + 1, j + 1)
                cells += [[v00, v10, c], [v10, v11, c], [v11, v01, c], [v01, v00, c]]
        vertices = np.concatenate([vertices, np.array(centers)], axis=0)
    else:
        raise ValueError(f"unknown diagonal: {diagonal!r}")

    return make_mesh(vertices, np.array(cells, dtype=np.int32))
