import numpy as np
import pytest

from feonet_navier_stokes_tpu.geometry import (
    build_taylor_hood,
    structured_rectangle,
)


@pytest.mark.parametrize(
    "n,ne,ng",
    [
        (6, 72, 387),  # reference FEONet_Stokes_square ne=72 config
        (10, 200, 1003),  # FEONet_time_dep_Stokes ne=200
        (15, 450, 2178),  # FEONet_steady_Navier-Stokes ne=450
    ],
)
def test_reference_problem_sizes(n, ne, ng):
    """DoF counts match the reference problem sizes (BASELINE.md table)."""
    mesh = structured_rectangle(n, n)
    sp = build_taylor_hood(mesh)
    assert mesh.num_cells == ne
    assert sp.ng == ng


def test_cells_ccw():
    mesh = structured_rectangle(3, 5, diagonal="left")
    v = mesh.cell_vertices()
    det = (v[:, 1, 0] - v[:, 0, 0]) * (v[:, 2, 1] - v[:, 0, 1]) - (
        v[:, 1, 1] - v[:, 0, 1]
    ) * (v[:, 2, 0] - v[:, 0, 0])
    assert np.all(det > 0)


def test_boundary_facets_count():
    mesh = structured_rectangle(4, 4)
    # 4 sides x 4 facets per side
    assert mesh.boundary_facets.shape[0] == 16


def test_p2_midpoints_coords(space_4x4):
    sp = space_4x4
    # midpoint node coordinates are averages of edge endpoints
    nv = sp.mesh.num_vertices
    mids = sp.p2_coords[nv:]
    expect = 0.5 * (sp.mesh.vertices[sp.edges[:, 0]] + sp.mesh.vertices[sp.edges[:, 1]])
    np.testing.assert_allclose(mids, expect)


def test_cell_dofs_p2_local_convention(space_4x4):
    sp = space_4x4
    v = sp.mesh.vertices
    coords = sp.p2_coords
    for c in range(sp.mesh.num_cells):
        d = sp.cell_dofs_p2[c]
        tri = sp.mesh.cells[c]
        # node 3 = midpoint of (v1, v2), node 4 = (v0, v2), node 5 = (v0, v1)
        np.testing.assert_allclose(coords[d[3]], 0.5 * (v[tri[1]] + v[tri[2]]))
        np.testing.assert_allclose(coords[d[4]], 0.5 * (v[tri[0]] + v[tri[2]]))
        np.testing.assert_allclose(coords[d[5]], 0.5 * (v[tri[0]] + v[tri[1]]))


def test_idx_sol_contiguous(space_4x4):
    sp = space_4x4
    idx = sp.idx_sol
    assert idx[0][0] == 0 and idx[1][0] == sp.n2 and idx[2][0] == 2 * sp.n2
    assert sp.ng == 2 * sp.n2 + sp.n1


def test_boundary_flags(space_4x4):
    sp = space_4x4
    on_b = (
        (np.abs(sp.p2_coords[:, 0]) < 1e-12)
        | (np.abs(sp.p2_coords[:, 0] - 1) < 1e-12)
        | (np.abs(sp.p2_coords[:, 1]) < 1e-12)
        | (np.abs(sp.p2_coords[:, 1] - 1) < 1e-12)
    )
    np.testing.assert_array_equal(sp.p2_on_boundary, on_b)
