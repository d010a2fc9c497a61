"""Jitted Taylor-Hood operator assembly: vmapped element kernels + segment-sum
scatter into dense blocks.

This is the TPU-native replacement for the reference's FEniCS/DOLFIN C++
assembly path:
  * bilinear forms: FEONet_Stokes_square/assemble_fenics.py:56-70 (grad form),
    FEONet-square-with-hole/assemble_fenics.py:88-96 (symmetric-gradient form),
    FEONet_steady_Navier-Stokes/assemble_fenics.py:88-117 (A, B1, B2),
    FEONet_time_dep_Stokes/assemble_fenics.py:109-136 (S, A, constant load).
  * load vectors: assemble(inner(f, v) * dx) per sample — here one batched
    einsum over all samples at once.
  * Dirichlet row lifting identical to dolfin ``bc.apply(A[, L])`` (zero the
    constrained rows, unit diagonal, set RHS entries to the BC value).

All element integrals are computed for every cell at once (einsum over a
static quadrature tabulation) and scattered with a *pre-sorted* segment-sum,
so the whole assembly is one fused XLA program with no host round trips.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.taylor_hood import TaylorHoodSpace
from .basis import p1_basis, p2_basis
from .quadrature import triangle_quadrature

Array = Any


# ---------------------------------------------------------------------------
# Element geometry
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ElementGeometry:
    """Affine-map data per cell: x = v0 + J @ (xi, eta)."""

    inv_jt: Array  # (nc, 2, 2) J^{-T}
    det_j: Array  # (nc,) |det J| (> 0 for CCW cells)
    v0: Array  # (nc, 2)
    jac: Array  # (nc, 2, 2)


def element_geometry(space: TaylorHoodSpace, dtype=jnp.float32) -> ElementGeometry:
    v = space.mesh.cell_vertices().astype(np.float64)  # (nc, 3, 2)
    jac = np.stack([v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]], axis=2)  # (nc,2,2) cols
    det = jac[:, 0, 0] * jac[:, 1, 1] - jac[:, 0, 1] * jac[:, 1, 0]
    inv_j = (
        np.stack(
            [
                np.stack([jac[:, 1, 1], -jac[:, 0, 1]], axis=1),
                np.stack([-jac[:, 1, 0], jac[:, 0, 0]], axis=1),
            ],
            axis=1,
        )
        / det[:, None, None]
    )
    return ElementGeometry(
        inv_jt=jnp.asarray(np.swapaxes(inv_j, 1, 2), dtype=dtype),
        det_j=jnp.asarray(det, dtype=dtype),
        v0=jnp.asarray(v[:, 0], dtype=dtype),
        jac=jnp.asarray(jac, dtype=dtype),
    )


def physical_quad_points(space: TaylorHoodSpace, degree: int, dtype=jnp.float32) -> Array:
    """(nc, nq, 2) quadrature points mapped to physical coordinates."""
    pts, _ = triangle_quadrature(degree)
    geom = element_geometry(space, dtype=jnp.float64)
    xq = geom.v0[:, None, :] + jnp.einsum(
        "cij,qj->cqi", geom.jac, jnp.asarray(pts, dtype=jnp.float64)
    )
    return xq.astype(dtype)


# ---------------------------------------------------------------------------
# Scatter (pre-sorted segment-sum into a dense block)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BlockScatter:
    """Static scatter plan: element-value order -> sorted linear indices."""

    perm: np.ndarray  # argsort of the flattened linear ids
    sorted_ids: np.ndarray
    shape: tuple[int, int]


def make_block_scatter(
    rows_dofs: np.ndarray, cols_dofs: np.ndarray, nrows: int, ncols: int
) -> BlockScatter:
    """Plan a scatter of per-element blocks (nc, a, b) into dense (nrows, ncols).

    rows_dofs: (nc, a) global row ids; cols_dofs: (nc, b) global column ids.
    """
    rows = np.repeat(rows_dofs[:, :, None], cols_dofs.shape[1], axis=2)
    cols = np.repeat(cols_dofs[:, None, :], rows_dofs.shape[1], axis=1)
    lin = (rows.astype(np.int64) * ncols + cols.astype(np.int64)).ravel()
    perm = np.argsort(lin, kind="stable")
    return BlockScatter(perm=perm, sorted_ids=lin[perm], shape=(nrows, ncols))


def scatter_add_dense(vals: Array, plan: BlockScatter) -> Array:
    """Scatter (nc, a, b) element values into a dense (nrows, ncols) block."""
    flat = vals.reshape(-1)[jnp.asarray(plan.perm)]
    out = jax.ops.segment_sum(
        flat,
        jnp.asarray(plan.sorted_ids),
        num_segments=plan.shape[0] * plan.shape[1],
        indices_are_sorted=True,
    )
    return out.reshape(plan.shape)


# ---------------------------------------------------------------------------
# Tabulations (host-side, static constants inside jit)
# ---------------------------------------------------------------------------


def _tabulate(degree: int):
    pts, wts = triangle_quadrature(degree)
    v1, g1 = p1_basis(pts)
    v2, g2 = p2_basis(pts)
    return pts, wts, v1, g1, v2, g2


def _phys_grad_p2(space: TaylorHoodSpace, degree: int, dtype):
    """((nc, nq, 6, 2) physical P2 gradients, (nc, nq) w*|detJ|)."""
    pts, wts, _, _, _, g2 = _tabulate(degree)
    geom = element_geometry(space, dtype=dtype)
    g2 = jnp.asarray(g2, dtype=dtype)  # (nq, 6, 2) reference gradients
    gp = jnp.einsum("cij,qnj->cqni", geom.inv_jt, g2)
    wdet = jnp.asarray(wts, dtype=dtype)[None, :] * geom.det_j[:, None]
    return gp, wdet


# ---------------------------------------------------------------------------
# Scalar element kernels -> dense blocks
# ---------------------------------------------------------------------------


def assemble_scalar_block(
    space: TaylorHoodSpace,
    kind: str,
    degree: int = 4,
    dtype=jnp.float32,
) -> Array:
    """Assemble one scalar block.

    kind:
      'stiffness'    (n2, n2)  ∫ ∇φi·∇φj
      'kxx'          (n2, n2)  ∫ ∂xφi ∂xφj
      'kyy'          (n2, n2)  ∫ ∂yφi ∂yφj
      'kyx'          (n2, n2)  ∫ ∂yφi ∂xφj
      'mass'         (n2, n2)  ∫ φi φj
      'div_x'        (n2, n1)  ∫ ψj ∂xφi
      'div_y'        (n2, n1)  ∫ ψj ∂yφi
      'conv_x'       (n2, n2)  ∫ φi ∂xφj
      'conv_y'       (n2, n2)  ∫ φi ∂yφj
      'mass_p1'      (n1, n1)  ∫ ψi ψj
    """
    pts, wts, v1, _, v2, _ = _tabulate(degree)
    gp, wdet = _phys_grad_p2(space, degree, dtype)
    v2j = jnp.asarray(v2, dtype=dtype)  # (nq, 6)
    v1j = jnp.asarray(v1, dtype=dtype)  # (nq, 3)
    n2, n1 = space.n2, space.n1
    d2 = space.cell_dofs_p2
    d1 = space.cell_dofs_p1

    if kind == "stiffness":
        vals = jnp.einsum("cq,cqid,cqjd->cij", wdet, gp, gp)
        plan = make_block_scatter(d2, d2, n2, n2)
    elif kind in ("kxx", "kyy", "kyx"):
        a = 0 if kind[1] == "x" else 1
        b = 0 if kind[2] == "x" else 1
        vals = jnp.einsum("cq,cqi,cqj->cij", wdet, gp[..., a], gp[..., b])
        plan = make_block_scatter(d2, d2, n2, n2)
    elif kind == "mass":
        vals = jnp.einsum("cq,qi,qj->cij", wdet, v2j, v2j)
        plan = make_block_scatter(d2, d2, n2, n2)
    elif kind in ("div_x", "div_y"):
        a = 0 if kind.endswith("x") else 1
        vals = jnp.einsum("cq,cqi,qj->cij", wdet, gp[..., a], v1j)
        plan = make_block_scatter(d2, d1, n2, n1)
    elif kind in ("conv_x", "conv_y"):
        a = 0 if kind.endswith("x") else 1
        vals = jnp.einsum("cq,qi,cqj->cij", wdet, v2j, gp[..., a])
        plan = make_block_scatter(d2, d2, n2, n2)
    elif kind == "mass_p1":
        vals = jnp.einsum("cq,qi,qj->cij", wdet, v1j, v1j)
        plan = make_block_scatter(d1, d1, n1, n1)
    else:
        raise ValueError(f"unknown block kind: {kind!r}")
    return scatter_add_dense(vals, plan)


# ---------------------------------------------------------------------------
# Mixed Stokes operator
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class StokesOperators:
    """Raw (pre-BC) mixed operators in the canonical [u1|u2|p] layout."""

    matrix: Array  # (ng, ng) viscous + pressure coupling


def assemble_stokes(
    space: TaylorHoodSpace,
    mu: float,
    viscous_form: str = "grad",
    div_sign_vp: float = -1.0,
    div_sign_pu: float = -1.0,
    degree: int = 4,
    dtype=jnp.float32,
) -> Array:
    """Assemble the mixed Stokes matrix (no BCs applied).

    viscous_form:
      'grad': mu * ∫ ∇v : ∇u            (FEONet_Stokes_square/assemble_fenics.py:60,
                                          FEONet_steady_Navier-Stokes:88-90,
                                          FEONet_time_dep_Stokes:109 with mu=1)
      'sym' : 0.5*mu * ∫ (∇v+∇vᵀ):(∇u+∇uᵀ)  (FEONet-square-with-hole:89-90)

    div_sign_vp * ∫ p div(v)  and  div_sign_pu * ∫ q div(u):
      stokes_square / steady NS:  (-1, -1)   '- p div v - q div u'
      hole / time-dep:            (-1, +1)   '- div(v) p + q div(u)'
    """
    n2, n1, ng = space.n2, space.n1, space.ng
    if viscous_form == "grad":
        K = mu * assemble_scalar_block(space, "stiffness", degree, dtype)
        K11, K22 = K, K
        K12 = None
    elif viscous_form == "sym":
        kxx = assemble_scalar_block(space, "kxx", degree, dtype)
        kyy = assemble_scalar_block(space, "kyy", degree, dtype)
        kyx = assemble_scalar_block(space, "kyx", degree, dtype)
        K11 = mu * (2.0 * kxx + kyy)
        K22 = mu * (kxx + 2.0 * kyy)
        K12 = mu * kyx  # (u1 row i, u2 col j): mu ∫ ∂yφi ∂xφj
    else:
        raise ValueError(f"unknown viscous_form: {viscous_form!r}")

    D1 = assemble_scalar_block(space, "div_x", degree, dtype)  # ∫ ψj ∂xφi
    D2 = assemble_scalar_block(space, "div_y", degree, dtype)

    A = jnp.zeros((ng, ng), dtype=dtype)
    A = A.at[:n2, :n2].set(K11)
    A = A.at[n2 : 2 * n2, n2 : 2 * n2].set(K22)
    if K12 is not None:
        A = A.at[:n2, n2 : 2 * n2].set(K12)
        A = A.at[n2 : 2 * n2, :n2].set(K12.T)
    A = A.at[:n2, 2 * n2 :].set(div_sign_vp * D1)
    A = A.at[n2 : 2 * n2, 2 * n2 :].set(div_sign_vp * D2)
    A = A.at[2 * n2 :, :n2].set(div_sign_pu * D1.T)
    A = A.at[2 * n2 :, n2 : 2 * n2].set(div_sign_pu * D2.T)
    return A


def assemble_velocity_mass(
    space: TaylorHoodSpace, degree: int = 4, dtype=jnp.float32
) -> Array:
    """S = ∫ v·u dx on the mixed space (pressure block zero).

    Reference: FEONet_time_dep_Stokes/assemble_fenics.py:122-126.
    """
    n2, ng = space.n2, space.ng
    M = assemble_scalar_block(space, "mass", degree, dtype)
    S = jnp.zeros((ng, ng), dtype=dtype)
    S = S.at[:n2, :n2].set(M)
    S = S.at[n2 : 2 * n2, n2 : 2 * n2].set(M)
    return S


def assemble_convection(
    space: TaylorHoodSpace, degree: int = 4, dtype=jnp.float32
) -> tuple[Array, Array]:
    """Linearized convection matrices B1, B2 on the mixed space.

    B1[i,j] = ∫ (∂x u_j)·v_i, B2 with ∂y — block-diagonal over (u1, u2).
    Reference: FEONet_steady_Navier-Stokes/assemble_fenics.py:92-98
    (``dot(dot(grad(u), e_k), v) * dx``).
    """
    n2, ng = space.n2, space.ng
    C1 = assemble_scalar_block(space, "conv_x", degree, dtype)
    C2 = assemble_scalar_block(space, "conv_y", degree, dtype)
    B1 = jnp.zeros((ng, ng), dtype=dtype)
    B1 = B1.at[:n2, :n2].set(C1)
    B1 = B1.at[n2 : 2 * n2, n2 : 2 * n2].set(C1)
    B2 = jnp.zeros((ng, ng), dtype=dtype)
    B2 = B2.at[:n2, :n2].set(C2)
    B2 = B2.at[n2 : 2 * n2, n2 : 2 * n2].set(C2)
    return B1, B2


# ---------------------------------------------------------------------------
# Load vectors (batched over samples)
# ---------------------------------------------------------------------------


def _load_from_quad_values(
    space: TaylorHoodSpace, f_quad: Array, degree: int, dtype
) -> Array:
    """Load vectors from forcing values at quadrature points.

    f_quad: (B, nc, nq, 2) forcing (f1, f2) at the physical quadrature points.
    Returns (B, ng): ∫ f·v for every mixed test function (pressure rows 0).
    """
    _, wts, _, _, v2, _ = _tabulate(degree)
    _, wdet = _phys_grad_p2(space, degree, dtype)  # (nc, nq)
    v2j = jnp.asarray(v2, dtype=dtype)  # (nq, 6)
    # per-element load: (B, nc, 6, 2)
    el = jnp.einsum("cq,qi,bcqk->bcik", wdet, v2j, f_quad.astype(dtype))
    nc = space.mesh.num_cells
    ids = jnp.asarray(space.cell_dofs_p2.reshape(-1), dtype=jnp.int32)
    flat = el.reshape(el.shape[0], nc * 6, 2)
    # segment-sum over element-local contributions -> P2 nodal loads
    def seg(x):  # (nc*6,) -> (n2,)
        return jax.ops.segment_sum(x, ids, num_segments=space.n2)

    l1 = jax.vmap(seg)(flat[:, :, 0])
    l2 = jax.vmap(seg)(flat[:, :, 1])
    B = el.shape[0]
    return jnp.concatenate(
        [l1, l2, jnp.zeros((B, space.n1), dtype=dtype)], axis=1
    )


def assemble_load_sincos(
    space: TaylorHoodSpace,
    coeffs: Array,
    degree: int = 7,
    dtype=jnp.float32,
    validate_form: bool = False,
) -> Array:
    """Batched load vectors for the parametric sin/cos forcing.

    coeffs: (B, 6) = (m0, m1, n0, n1, n2, n3);
    f = (m0 sin(n0 x + n1 y), m1 cos(n2 x + n3 y))
    (reference: FEONet_Stokes_square/assemble_fenics.py:123-129, deg_f=5).
    ``validate_form=True`` uses the reference's validation-set variant
    f = (m0 + sin(..), m1 + cos(..)) (assemble_fenics.py:161 — an upstream
    inconsistency kept behind a flag).
    """
    xq = physical_quad_points(space, degree, dtype=dtype)  # (nc, nq, 2)
    x, y = xq[..., 0], xq[..., 1]
    m0, m1 = coeffs[:, 0], coeffs[:, 1]
    n0, n1, n2_, n3 = coeffs[:, 2], coeffs[:, 3], coeffs[:, 4], coeffs[:, 5]

    def bx(v):  # (B,) -> (B, 1, 1)
        return v[:, None, None]

    s = jnp.sin(bx(n0) * x[None] + bx(n1) * y[None])
    c = jnp.cos(bx(n2_) * x[None] + bx(n3) * y[None])
    if validate_form:
        f1, f2 = bx(m0) + s, bx(m1) + c
    else:
        f1, f2 = bx(m0) * s, bx(m1) * c
    f_quad = jnp.stack([f1, f2], axis=-1)  # (B, nc, nq, 2)
    return _load_from_quad_values(space, f_quad, degree, dtype)


def assemble_load_constant(
    space: TaylorHoodSpace, f: tuple[float, float], degree: int = 4, dtype=jnp.float32
) -> Array:
    """Load vector for a constant forcing, e.g. (5, -5) or (0, 0)
    (reference: FEONet_time_dep_Stokes/assemble_fenics.py:111-115)."""
    xq = physical_quad_points(space, degree, dtype=dtype)
    ones = jnp.ones(xq.shape[:2], dtype=dtype)
    f_quad = jnp.stack([f[0] * ones, f[1] * ones], axis=-1)[None]
    return _load_from_quad_values(space, f_quad, degree, dtype)[0]


def assemble_load_from_velocity_values(
    space: TaylorHoodSpace, u1_vals: Array, u2_vals: Array, degree: int = 4, dtype=jnp.float32
) -> Array:
    """Load vectors for forcing given as a P2 velocity FE function (GRF case).

    ∫ f·v with f = Σ_k f_k φ_k is the velocity mass matrix applied to the
    nodal values (reference: FEONet-square-with-hole/assemble_fenics.py:159-172
    builds a dolfin Function and assembles inner(f, v)*dx).
    u1_vals, u2_vals: (B, n2) nodal values. Returns (B, ng).
    """
    M = assemble_scalar_block(space, "mass", degree, dtype)
    l1 = u1_vals.astype(dtype) @ M.T
    l2 = u2_vals.astype(dtype) @ M.T
    B = u1_vals.shape[0]
    return jnp.concatenate([l1, l2, jnp.zeros((B, space.n1), dtype=dtype)], axis=1)


# ---------------------------------------------------------------------------
# Dirichlet BC row lifting (dolfin bc.apply semantics)
# ---------------------------------------------------------------------------


def apply_bc_matrix(A: Array, mask: Array) -> Array:
    """Zero the constrained rows and put 1 on their diagonal.

    Matches ``bc.apply(A)`` (reference: FEONet_Stokes_square/
    assemble_fenics.py:67-69). mask: (ng,) 1.0 where constrained.
    """
    mask = mask.astype(A.dtype)
    return A * (1.0 - mask)[:, None] + jnp.diag(mask)


def apply_bc_vector(L: Array, mask: Array, values: Array) -> Array:
    """Set constrained entries of the load vector(s) to the BC values.

    Matches the RHS effect of ``bc.apply(A, L)`` (reference:
    FEONet_Stokes_square/assemble_fenics.py:130-131). Broadcasts over leading
    batch dims.
    """
    mask = mask.astype(L.dtype)
    return L * (1.0 - mask) + values.astype(L.dtype) * mask
