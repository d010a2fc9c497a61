"""Square-with-hole at the reference's headline scale (VERDICT item 7).

The reference's ``generate_mesh(Rectangle - Circle, 14)`` gives ne=482-512,
ng=2549 (FEONet-square-with-hole/test.ipynb cells 14-16) with cond(A)=1750.40
-> SPAI(10000) 1.0000006. Our distmesh-style generator produces a different
(but same-family) triangulation, so element counts match to ~10% and the
condition numbers match in magnitude, not digits — the digit-exact operator
parity is pinned elsewhere via the structured-square FEniCS artifacts
(tests/test_fenics_import.py).
"""

import json
import os

import numpy as np
import pytest

from feonet_navier_stokes_tpu.geometry import square_with_hole_mesh, build_taylor_hood


@pytest.fixture(scope="module")
def hole_mesh_512():
    # the ProblemConfig default (hole_h=0.1205): ne=512 exactly
    return square_with_hole_mesh(h=0.1205)


def test_hole_mesh_reference_scale(hole_mesh_512):
    mesh = hole_mesh_512
    space = build_taylor_hood(mesh)
    assert mesh.num_cells == 512  # the reference's exact element count
    assert abs(space.ng - 2549) / 2549 < 0.02  # ours: 2539 (topology differs)
    # no vertex inside the hole; hole boundary resolved
    r = np.hypot(*mesh.vertices.T)
    assert r.min() > 0.49
    assert (r < 0.52).sum() >= 20


def test_hole_mesh_quality(hole_mesh_512):
    """Minimum triangle angle > 20 degrees — FEM-usable mesh, no slivers."""
    mesh = hole_mesh_512
    v = mesh.cell_vertices()
    angles = []
    for k in range(3):
        a = v[:, (k + 1) % 3] - v[:, k]
        b = v[:, (k + 2) % 3] - v[:, k]
        cosang = np.sum(a * b, 1) / (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1))
        angles.append(np.degrees(np.arccos(np.clip(cosang, -1, 1))))
    assert np.min(angles) > 20.0


@pytest.mark.skipif(not os.path.isfile("runs/hole_parity.json"),
                    reason="hole parity artifact not generated")
def test_hole_cond_parity_artifact():
    """Recorded SPAI parity at reference scale: raw cond within 2x of the
    reference's mesh realization; SPAI(10000) drives cond to ~1 + 1e-5."""
    with open("runs/hole_parity.json") as f:
        out = json.load(f)
    assert 800 < out["cond_raw_512scale"] < 3600  # reference mesh: 1750.40
    assert out["cond_spai10000_512scale"] < 1.001  # reference: 1.0000006
    assert 250 < out["cond_raw_154scale"] < 1100  # reference mesh: 542.94
    assert out["cond_spai1000_154scale"] < 1.1  # reference: 1.0112


@pytest.mark.slow
def test_hole_spai_parity_regenerate(hole_mesh_512):
    """Regenerate the ne~512 SPAI parity from scratch (~15 min)."""
    from feonet_navier_stokes_tpu.fem import assemble_stokes, apply_bc_matrix, make_bc
    from feonet_navier_stokes_tpu.fem.bcs import hole_bcs
    from feonet_navier_stokes_tpu.linalg import spai, condition_number

    space = build_taylor_hood(hole_mesh_512)
    bc = make_bc(space, hole_bcs("channel_flow"))
    A = apply_bc_matrix(
        assemble_stokes(space, 0.1, viscous_form="sym", div_sign_pu=+1.0), bc.mask
    )
    M = spai(A, 10000)
    assert condition_number(A @ M) < 1.001
