import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feonet_navier_stokes_tpu.fem import (
    apply_bc_matrix,
    apply_bc_vector,
    assemble_convection,
    assemble_load_constant,
    assemble_load_sincos,
    assemble_scalar_block,
    assemble_stokes,
    assemble_velocity_mass,
)
from feonet_navier_stokes_tpu.fem.bcs import hole_bcs, make_bc, square_bcs
from feonet_navier_stokes_tpu.geometry import build_taylor_hood, structured_rectangle


def test_mass_matrix_total(space_4x4):
    """sum_ij M_ij = ∫ 1 dx = area of unit square = 1 (P2 and P1)."""
    M2 = assemble_scalar_block(space_4x4, "mass", dtype=jnp.float64)
    M1 = assemble_scalar_block(space_4x4, "mass_p1", dtype=jnp.float64)
    np.testing.assert_allclose(float(M2.sum()), 1.0, rtol=1e-12)
    np.testing.assert_allclose(float(M1.sum()), 1.0, rtol=1e-12)


def test_stiffness_annihilates_constants(space_4x4):
    K = assemble_scalar_block(space_4x4, "stiffness", dtype=jnp.float64)
    ones = jnp.ones(space_4x4.n2, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(K @ ones), 0.0, atol=1e-12)


def test_stiffness_exact_on_linear(space_4x4):
    """u = x (exactly representable in P2): uᵀ K u = ∫ |∇u|² = 1."""
    K = assemble_scalar_block(space_4x4, "stiffness", dtype=jnp.float64)
    u = jnp.asarray(space_4x4.p2_coords[:, 0])
    np.testing.assert_allclose(float(u @ K @ u), 1.0, rtol=1e-12)


def test_divergence_block_exact(space_4x4):
    """div_x[i,j] = ∫ ψ_j ∂xφ_i: with u1 = x, sum over p-hat of ∫ψ_j = 1."""
    D1 = assemble_scalar_block(space_4x4, "div_x", dtype=jnp.float64)
    u = jnp.asarray(space_4x4.p2_coords[:, 0])  # ∂x u = 1
    # uᵀ D1 gives (∫ ψ_j ∂x u)_j = (∫ ψ_j)_j which sums to the area 1
    np.testing.assert_allclose(float((u @ D1).sum()), 1.0, rtol=1e-12)


def test_convection_exact(space_4x4):
    """conv_x[i,j] = ∫ φ_i ∂xφ_j with u = x: row sums integrate φ_i."""
    C1 = assemble_scalar_block(space_4x4, "conv_x", dtype=jnp.float64)
    u = jnp.asarray(space_4x4.p2_coords[:, 0])
    got = np.asarray(C1 @ u)  # (∫ φ_i * 1)_i
    M = assemble_scalar_block(space_4x4, "mass", dtype=jnp.float64)
    want = np.asarray(M @ jnp.ones(space_4x4.n2))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_condition_number_parity_ne72_channel():
    """cond(matrix) for ne=72 channel_flow must match the FEniCS value 167.33
    (BASELINE.md / FEONet_Stokes_square/test.ipynb cell 3). The condition
    number is invariant under DoF permutations, so this pins mesh, quadrature,
    forms and BC row lifting against the reference assembly."""
    sp = build_taylor_hood(structured_rectangle(6, 6))
    A = assemble_stokes(sp, mu=0.1, dtype=jnp.float64)
    bc = make_bc(sp, square_bcs("channel_flow"))
    Abc = apply_bc_matrix(A, jnp.asarray(bc.mask))
    cond = np.linalg.cond(np.asarray(Abc))
    np.testing.assert_allclose(cond, 167.33, rtol=2e-4)


def test_sym_form_consistency(space_4x4):
    """For divergence-free fields the sym-grad form equals ∫2μ ε:ε; check the
    operator is symmetric in its velocity block and annihilates rigid motions."""
    A = assemble_stokes(
        space_4x4, mu=0.1, viscous_form="sym", div_sign_vp=-1.0, div_sign_pu=1.0,
        dtype=jnp.float64,
    )
    n2 = space_4x4.n2
    Avv = np.asarray(A[: 2 * n2, : 2 * n2])
    np.testing.assert_allclose(Avv, Avv.T, atol=1e-12)
    # rigid rotation u = (-y, x): ε(u) = 0 -> viscous block annihilates it
    rot = np.concatenate([-space_4x4.p2_coords[:, 1], space_4x4.p2_coords[:, 0]])
    np.testing.assert_allclose(Avv @ rot, 0.0, atol=1e-12)


def test_velocity_mass(space_4x4):
    S = assemble_velocity_mass(space_4x4, dtype=jnp.float64)
    n2, n1 = space_4x4.n2, space_4x4.n1
    # pressure block entirely zero
    np.testing.assert_allclose(np.asarray(S[2 * n2 :, :]), 0.0)
    np.testing.assert_allclose(np.asarray(S[:, 2 * n2 :]), 0.0)
    # uᵀ S u = ∫ |u|² for u = (x, y): = 2/3
    u = np.concatenate(
        [space_4x4.p2_coords[:, 0], space_4x4.p2_coords[:, 1], np.zeros(n1)]
    )
    np.testing.assert_allclose(float(u @ np.asarray(S) @ u), 2.0 / 3.0, rtol=1e-12)


def test_convection_matrices(space_4x4):
    B1, B2 = assemble_convection(space_4x4, dtype=jnp.float64)
    n2 = space_4x4.n2
    # B1 u with u=(x, x): each velocity row i gives ∫ φ_i
    u = np.concatenate(
        [space_4x4.p2_coords[:, 0], space_4x4.p2_coords[:, 0], np.zeros(space_4x4.n1)]
    )
    got = np.asarray(B1) @ u
    M = np.asarray(assemble_scalar_block(space_4x4, "mass", dtype=jnp.float64))
    want = np.concatenate([M.sum(1), M.sum(1), np.zeros(space_4x4.n1)])
    np.testing.assert_allclose(got, want, atol=1e-12)
    # B2 annihilates fields constant in y
    np.testing.assert_allclose(np.asarray(B2) @ u, 0.0, atol=1e-12)


def test_load_sincos_vs_dense_quadrature(space_4x4):
    """Batched load assembly matches a direct high-degree numpy quadrature."""
    from feonet_navier_stokes_tpu.fem.assemble import physical_quad_points
    from feonet_navier_stokes_tpu.fem.quadrature import triangle_quadrature
    from feonet_navier_stokes_tpu.fem.basis import p2_basis

    rng = np.random.default_rng(3)
    coeffs = np.concatenate(
        [rng.uniform(size=(2, 2)), np.pi * rng.uniform(size=(2, 4))], axis=1
    )
    L = np.asarray(
        assemble_load_sincos(space_4x4, jnp.asarray(coeffs), degree=7, dtype=jnp.float64)
    )
    # independent numpy evaluation at degree 12
    pts, wts = triangle_quadrature(12)
    v2, _ = p2_basis(pts)
    xq = np.asarray(physical_quad_points(space_4x4, 12, dtype=jnp.float64))
    dets = []
    v = space_4x4.mesh.cell_vertices()
    det = (v[:, 1, 0] - v[:, 0, 0]) * (v[:, 2, 1] - v[:, 0, 1]) - (
        v[:, 1, 1] - v[:, 0, 1]
    ) * (v[:, 2, 0] - v[:, 0, 0])
    for b in range(2):
        m0, m1, n0, n1_, n2_, n3 = coeffs[b]
        f1 = m0 * np.sin(n0 * xq[..., 0] + n1_ * xq[..., 1])
        f2 = m1 * np.cos(n2_ * xq[..., 0] + n3 * xq[..., 1])
        l1 = np.zeros(space_4x4.n2)
        l2 = np.zeros(space_4x4.n2)
        el1 = np.einsum("q,c,qi,cq->ci", wts, det, v2, f1)
        el2 = np.einsum("q,c,qi,cq->ci", wts, det, v2, f2)
        np.add.at(l1, space_4x4.cell_dofs_p2.ravel(), el1.ravel())
        np.add.at(l2, space_4x4.cell_dofs_p2.ravel(), el2.ravel())
        np.testing.assert_allclose(L[b, : space_4x4.n2], l1, atol=2e-8)
        np.testing.assert_allclose(
            L[b, space_4x4.n2 : 2 * space_4x4.n2], l2, atol=2e-8
        )
        np.testing.assert_allclose(L[b, 2 * space_4x4.n2 :], 0.0)


def test_load_constant(space_4x4):
    L = np.asarray(
        assemble_load_constant(space_4x4, (5.0, -5.0), dtype=jnp.float64)
    )
    # total: sum over u1 rows = 5 * area
    np.testing.assert_allclose(L[: space_4x4.n2].sum(), 5.0, rtol=1e-12)
    np.testing.assert_allclose(
        L[space_4x4.n2 : 2 * space_4x4.n2].sum(), -5.0, rtol=1e-12
    )


def test_bc_apply_semantics(space_4x4):
    A = assemble_stokes(space_4x4, mu=0.1, dtype=jnp.float64)
    bc = make_bc(space_4x4, square_bcs("lower"))
    Abc = np.asarray(apply_bc_matrix(A, jnp.asarray(bc.mask)))
    idx = bc.indices
    # constrained rows are identity rows
    np.testing.assert_allclose(Abc[idx], np.eye(space_4x4.ng)[idx])
    # unconstrained rows untouched
    free = np.setdiff1d(np.arange(space_4x4.ng), idx)
    np.testing.assert_allclose(Abc[free], np.asarray(A)[free])
    # vector: constrained entries replaced with BC values
    L = jnp.ones(space_4x4.ng, dtype=jnp.float64)
    Lbc = np.asarray(apply_bc_vector(L, jnp.asarray(bc.mask), jnp.asarray(bc.values)))
    x = space_4x4.p2_coords[:, 0]
    bottom = space_4x4.p2_coords[:, 1] < 1e-12
    np.testing.assert_allclose(
        Lbc[: space_4x4.n2][bottom], 3.0 + 1.7 * np.sin(2 * np.pi * x[bottom])
    )
    np.testing.assert_allclose(Lbc[space_4x4.n2 : 2 * space_4x4.n2][bottom], 0.0)


def test_channel_bc_sets(space_4x4):
    bc = make_bc(space_4x4, square_bcs("channel_flow"))
    n2 = space_4x4.n2
    vals = bc.values
    mask = bc.mask
    # pressure dofs at x=0 get 8, x=1 get 0
    px = space_4x4.p1_coords[:, 0]
    left = np.abs(px) < 1e-12
    right = np.abs(px - 1.0) < 1e-12
    np.testing.assert_allclose(vals[2 * n2 :][left], 8.0)
    np.testing.assert_array_equal(mask[2 * n2 :][left], 1.0)
    np.testing.assert_allclose(vals[2 * n2 :][right], 0.0)
    np.testing.assert_array_equal(mask[2 * n2 :][right], 1.0)
    # interior pressure unconstrained
    interior = ~(left | right)
    np.testing.assert_array_equal(mask[2 * n2 :][interior], 0.0)


def test_native_load_sincos_matches_numpy(space_4x4):
    """The fused C++ load kernel (native/load.cpp) agrees with the numpy
    einsum+scatter path to f64 rounding, for both forcing forms."""
    import feonet_navier_stokes_tpu.fem.assemble as asm
    from feonet_navier_stokes_tpu.fem.assemble import (
        _native_load_sincos,
        physical_quad_points,
    )

    rng = np.random.default_rng(7)
    coeffs = np.concatenate(
        [rng.uniform(size=(5, 2)), np.pi * rng.uniform(size=(5, 4))], axis=1
    )
    xq = physical_quad_points(space_4x4, 7)
    for validate_form in (False, True):
        nat = _native_load_sincos(space_4x4, coeffs, xq, 7, validate_form)
        if nat is None:
            pytest.skip("native library unavailable in this environment")
        orig = asm._native_load_sincos
        asm._native_load_sincos = lambda *a, **k: None
        try:
            ref = assemble_load_sincos(
                space_4x4, coeffs, degree=7, validate_form=validate_form
            )
        finally:
            asm._native_load_sincos = orig
        np.testing.assert_allclose(nat, ref, rtol=1e-13, atol=1e-15)
