"""Taylor-Hood operator assembly: vectorized element kernels + segment-sum
scatter into dense blocks — host-side numpy, float64 internals UNCONDITIONALLY.

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

Placement rationale (TPU-first): operators and datasets are *setup-time
constants* — they are assembled once per problem/dataset on the host in full
float64 (matching the f64 FEniCS/NumPy reference pipeline bit-for-bit in
precision), then shipped to the device once at the training dtype. Only the
train/eval step runs on the TPU. This removes the former silent f64->f32
truncation on TPU backends (jax_enable_x64 is never required): ground truth,
SPAI, and condition numbers are exact regardless of the active JAX backend.

All element integrals are computed for every cell at once (einsum over a
static quadrature tabulation) and scattered with one bincount segment-sum —
no Python per-element loops anywhere.
"""

from __future__ import annotations

import dataclasses
from typing import Any

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

    inv_jt: np.ndarray  # (nc, 2, 2) J^{-T}
    det_j: np.ndarray  # (nc,) |det J| (> 0 for CCW cells)
    v0: np.ndarray  # (nc, 2)
    jac: np.ndarray  # (nc, 2, 2)


def element_geometry(space: TaylorHoodSpace, dtype=np.float64) -> ElementGeometry:
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
        inv_jt=np.swapaxes(inv_j, 1, 2).astype(dtype),
        det_j=det.astype(dtype),
        v0=v[:, 0].astype(dtype),
        jac=jac.astype(dtype),
    )


def physical_quad_points(
    space: TaylorHoodSpace, degree: int, dtype=np.float64
) -> np.ndarray:
    """(nc, nq, 2) quadrature points mapped to physical coordinates."""
    pts, _ = triangle_quadrature(degree)
    geom = element_geometry(space, dtype=np.float64)
    xq = geom.v0[:, None, :] + np.einsum(
        "cij,qj->cqi", geom.jac, np.asarray(pts, dtype=np.float64)
    )
    return xq.astype(dtype)


# ---------------------------------------------------------------------------
# Scatter (segment-sum into a dense block)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BlockScatter:
    """Static scatter plan: element-value order -> sorted linear indices.

    The sorted layout keeps the plan reusable for on-device segment-sum
    scatters (ops/block_sparse.py); the host path just bincounts.
    """

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


def scatter_add_dense(vals: Array, plan: BlockScatter) -> np.ndarray:
    """Scatter (nc, a, b) element values into a dense (nrows, ncols) block."""
    flat = np.asarray(vals, dtype=np.float64).reshape(-1)[plan.perm]
    out = np.bincount(
        plan.sorted_ids,
        weights=flat,
        minlength=plan.shape[0] * plan.shape[1],
    )
    return out.reshape(plan.shape)


def scatter_add_csr(vals: Array, plan: BlockScatter):
    """Scatter element values into a scipy CSR block — the memory-scalable
    path for the ~50k-DoF stretch configs where a dense (ng, ng) float64
    operator would not fit (SURVEY.md §7 step 7)."""
    from scipy.sparse import coo_matrix

    flat = np.asarray(vals, dtype=np.float64).reshape(-1)
    rows, cols = np.divmod(
        plan.sorted_ids[np.argsort(plan.perm, kind="stable")], plan.shape[1]
    )
    return coo_matrix((flat, (rows, cols)), shape=plan.shape).tocsr()


# ---------------------------------------------------------------------------
# Tabulations (static constants)
# ---------------------------------------------------------------------------


def _tabulate(degree: int):
    pts, wts = triangle_quadrature(degree)
    v1, g1 = p1_basis(pts)
    v2, g2 = p2_basis(pts)
    return pts, wts, v1, g1, v2, g2


def _phys_grad_p2(space: TaylorHoodSpace, degree: int, dtype=np.float64):
    """((nc, nq, 6, 2) physical P2 gradients, (nc, nq) w*|detJ|)."""
    pts, wts, _, _, _, g2 = _tabulate(degree)
    geom = element_geometry(space, dtype=np.float64)
    g2 = np.asarray(g2, dtype=np.float64)  # (nq, 6, 2) reference gradients
    gp = np.einsum("cij,qnj->cqni", geom.inv_jt, g2)
    wdet = np.asarray(wts, dtype=np.float64)[None, :] * geom.det_j[:, None]
    return gp.astype(dtype), wdet.astype(dtype)


# ---------------------------------------------------------------------------
# Scalar element kernels -> dense blocks
# ---------------------------------------------------------------------------


def assemble_scalar_block(
    space: TaylorHoodSpace,
    kind: str,
    degree: int = 4,
    dtype=np.float64,
    fmt: str = "dense",
) -> np.ndarray:
    """Assemble one scalar block (float64 internals, cast to dtype on return).
    ``fmt='csr'`` returns scipy CSR instead of dense (large-ng path).

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
    gp, wdet = _phys_grad_p2(space, degree)
    v2j = np.asarray(v2, dtype=np.float64)  # (nq, 6)
    v1j = np.asarray(v1, dtype=np.float64)  # (nq, 3)
    n2, n1 = space.n2, space.n1
    d2 = space.cell_dofs_p2
    d1 = space.cell_dofs_p1

    if kind == "stiffness":
        vals = np.einsum("cq,cqid,cqjd->cij", wdet, gp, gp)
        plan = make_block_scatter(d2, d2, n2, n2)
    elif kind in ("kxx", "kyy", "kyx"):
        a = 0 if kind[1] == "x" else 1
        b = 0 if kind[2] == "x" else 1
        vals = np.einsum("cq,cqi,cqj->cij", wdet, gp[..., a], gp[..., b])
        plan = make_block_scatter(d2, d2, n2, n2)
    elif kind == "mass":
        vals = np.einsum("cq,qi,qj->cij", wdet, v2j, v2j)
        plan = make_block_scatter(d2, d2, n2, n2)
    elif kind in ("div_x", "div_y"):
        a = 0 if kind.endswith("x") else 1
        vals = np.einsum("cq,cqi,qj->cij", wdet, gp[..., a], v1j)
        plan = make_block_scatter(d2, d1, n2, n1)
    elif kind in ("conv_x", "conv_y"):
        a = 0 if kind.endswith("x") else 1
        vals = np.einsum("cq,qi,cqj->cij", wdet, v2j, gp[..., a])
        plan = make_block_scatter(d2, d2, n2, n2)
    elif kind == "mass_p1":
        vals = np.einsum("cq,qi,qj->cij", wdet, v1j, v1j)
        plan = make_block_scatter(d1, d1, n1, n1)
    else:
        raise ValueError(f"unknown block kind: {kind!r}")
    if fmt == "csr":
        return scatter_add_csr(vals, plan).astype(dtype)
    return scatter_add_dense(vals, plan).astype(dtype)


# ---------------------------------------------------------------------------
# Mixed Stokes operator
# ---------------------------------------------------------------------------


def assemble_stokes(
    space: TaylorHoodSpace,
    mu: float,
    viscous_form: str = "grad",
    div_sign_vp: float = -1.0,
    div_sign_pu: float = -1.0,
    degree: int = 4,
    dtype=np.float64,
    fmt: str = "dense",
) -> np.ndarray:
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
        K = mu * assemble_scalar_block(space, "stiffness", degree, fmt=fmt)
        K11, K22 = K, K
        K12 = None
    elif viscous_form == "sym":
        kxx = assemble_scalar_block(space, "kxx", degree, fmt=fmt)
        kyy = assemble_scalar_block(space, "kyy", degree, fmt=fmt)
        kyx = assemble_scalar_block(space, "kyx", degree, fmt=fmt)
        K11 = mu * (2.0 * kxx + kyy)
        K22 = mu * (kxx + 2.0 * kyy)
        K12 = mu * kyx  # (u1 row i, u2 col j): mu ∫ ∂yφi ∂xφj
    else:
        raise ValueError(f"unknown viscous_form: {viscous_form!r}")

    D1 = assemble_scalar_block(space, "div_x", degree, fmt=fmt)  # ∫ ψj ∂xφi
    D2 = assemble_scalar_block(space, "div_y", degree, fmt=fmt)

    if fmt == "csr":
        from scipy.sparse import bmat

        return bmat(
            [
                [K11, K12, div_sign_vp * D1],
                [K12.T if K12 is not None else None, K22, div_sign_vp * D2],
                [div_sign_pu * D1.T, div_sign_pu * D2.T, None],
            ],
            format="csr",
        ).astype(dtype)

    A = np.zeros((ng, ng), dtype=np.float64)
    A[:n2, :n2] = K11
    A[n2 : 2 * n2, n2 : 2 * n2] = K22
    if K12 is not None:
        A[:n2, n2 : 2 * n2] = K12
        A[n2 : 2 * n2, :n2] = K12.T
    A[:n2, 2 * n2 :] = div_sign_vp * D1
    A[n2 : 2 * n2, 2 * n2 :] = div_sign_vp * D2
    A[2 * n2 :, :n2] = div_sign_pu * D1.T
    A[2 * n2 :, n2 : 2 * n2] = div_sign_pu * D2.T
    return A.astype(dtype)


def assemble_velocity_mass(
    space: TaylorHoodSpace, degree: int = 4, dtype=np.float64, fmt: str = "dense"
) -> np.ndarray:
    """S = ∫ v·u dx on the mixed space (pressure block zero).

    Reference: FEONet_time_dep_Stokes/assemble_fenics.py:122-126.
    """
    n2, ng = space.n2, space.ng
    M = assemble_scalar_block(space, "mass", degree, fmt=fmt)
    if fmt == "csr":
        from scipy.sparse import bmat, csr_matrix

        Z = csr_matrix((space.n1, space.n1))
        return bmat([[M, None, None], [None, M, None], [None, None, Z]],
                    format="csr").astype(dtype)
    S = np.zeros((ng, ng), dtype=np.float64)
    S[:n2, :n2] = M
    S[n2 : 2 * n2, n2 : 2 * n2] = M
    return S.astype(dtype)


def assemble_convection(
    space: TaylorHoodSpace, degree: int = 4, dtype=np.float64, fmt: str = "dense"
) -> tuple[np.ndarray, np.ndarray]:
    """Linearized convection matrices B1, B2 on the mixed space.

    B1[i,j] = ∫ (∂x u_j)·v_i, B2 with ∂y — block-diagonal over (u1, u2).
    Reference: FEONet_steady_Navier-Stokes/assemble_fenics.py:92-98
    (``dot(dot(grad(u), e_k), v) * dx``).
    """
    n2, ng = space.n2, space.ng
    C1 = assemble_scalar_block(space, "conv_x", degree, fmt=fmt)
    C2 = assemble_scalar_block(space, "conv_y", degree, fmt=fmt)
    if fmt == "csr":
        from scipy.sparse import bmat, csr_matrix

        Z = csr_matrix((space.n1, space.n1))

        def mixed(C):
            return bmat([[C, None, None], [None, C, None], [None, None, Z]],
                        format="csr").astype(dtype)

        return mixed(C1), mixed(C2)
    B1 = np.zeros((ng, ng), dtype=np.float64)
    B1[:n2, :n2] = C1
    B1[n2 : 2 * n2, n2 : 2 * n2] = C1
    B2 = np.zeros((ng, ng), dtype=np.float64)
    B2[:n2, :n2] = C2
    B2[n2 : 2 * n2, n2 : 2 * n2] = C2
    return B1.astype(dtype), B2.astype(dtype)


# ---------------------------------------------------------------------------
# Load vectors (batched over samples)
# ---------------------------------------------------------------------------


def _p2_scatter_matrix(space: TaylorHoodSpace):
    """CSR (n2, nc*6) summing element-local P2 contributions into nodes."""
    from scipy.sparse import csr_matrix

    ids = space.cell_dofs_p2.reshape(-1)
    n = ids.shape[0]
    return csr_matrix(
        (np.ones(n), (ids.astype(np.int64), np.arange(n, dtype=np.int64))),
        shape=(space.n2, n),
    )


def _load_from_quad_values(
    space: TaylorHoodSpace, f_quad: Array, degree: int, dtype=np.float64
) -> np.ndarray:
    """Load vectors from forcing values at quadrature points.

    f_quad: (B, nc, nq, 2) forcing (f1, f2) at the physical quadrature points.
    Returns (B, ng): ∫ f·v for every mixed test function (pressure rows 0).
    """
    _, wts, _, _, v2, _ = _tabulate(degree)
    _, wdet = _phys_grad_p2(space, degree)  # (nc, nq)
    v2j = np.asarray(v2, dtype=np.float64)  # (nq, 6)
    f_quad = np.asarray(f_quad, dtype=np.float64)
    # per-element load: (B, nc, 6, 2)
    el = np.einsum("cq,qi,bcqk->bcik", wdet, v2j, f_quad)
    B = el.shape[0]
    nc = space.mesh.num_cells
    P = _p2_scatter_matrix(space)  # (n2, nc*6)
    flat = el.transpose(0, 3, 1, 2).reshape(B * 2, nc * 6)  # rows: (b, comp)
    nodal = (P @ flat.T).T.reshape(B, 2, space.n2)
    return np.concatenate(
        [nodal[:, 0], nodal[:, 1], np.zeros((B, space.n1))], axis=1
    ).astype(dtype)


def _native_load_sincos(
    space: TaylorHoodSpace,
    coeffs: np.ndarray,
    xq: np.ndarray,
    degree: int,
    validate_form: bool,
) -> np.ndarray | None:
    """Fused C++ path for ``assemble_load_sincos`` (None -> use numpy)."""
    from .._native import as_f64, as_i32, native_lib

    lib = native_lib()
    if lib is None:
        return None
    import ctypes

    _, wts, _, _, v2, _ = _tabulate(degree)
    _, wdet = _phys_grad_p2(space, degree)
    B = coeffs.shape[0]
    nc, nq = wdet.shape
    out = np.zeros((B, space.ng), dtype=np.float64)
    f64p = ctypes.POINTER(ctypes.c_double)
    i32p = ctypes.POINTER(ctypes.c_int32)
    rc = lib.load_sincos(
        as_f64(xq).ctypes.data_as(f64p),
        as_f64(wdet).ctypes.data_as(f64p),
        as_f64(v2).ctypes.data_as(f64p),
        as_i32(space.cell_dofs_p2).ctypes.data_as(i32p),
        as_f64(coeffs).ctypes.data_as(f64p),
        B, nc, nq, int(validate_form), space.n2, space.ng,
        out.ctypes.data_as(f64p),
    )
    return out if rc == 0 else None


def assemble_load_sincos(
    space: TaylorHoodSpace,
    coeffs: Array,
    degree: int = 7,
    dtype=np.float64,
    validate_form: bool = False,
) -> np.ndarray:
    """Batched load vectors for the parametric sin/cos forcing.

    coeffs: (B, 6) = (m0, m1, n0, n1, n2, n3);
    f = (m0 sin(n0 x + n1 y), m1 cos(n2 x + n3 y))
    (reference: FEONet_Stokes_square/assemble_fenics.py:123-129, deg_f=5).
    ``validate_form=True`` uses the reference's validation-set variant
    f = (m0 + sin(..), m1 + cos(..)) (assemble_fenics.py:161 — an upstream
    inconsistency kept behind a flag).

    Runs the fused native kernel (native/load.cpp: one pass, no batch-sized
    temporaries — ~40x the numpy path) when buildable; numpy otherwise.
    Both paths agree to f64 rounding (summation order differs).
    """
    coeffs = np.asarray(coeffs, dtype=np.float64)
    xq = physical_quad_points(space, degree)  # (nc, nq, 2)
    native = _native_load_sincos(space, coeffs, xq, degree, validate_form)
    if native is not None:
        return native.astype(dtype)
    x, y = xq[..., 0], xq[..., 1]
    m0, m1 = coeffs[:, 0], coeffs[:, 1]
    n0, n1, n2_, n3 = coeffs[:, 2], coeffs[:, 3], coeffs[:, 4], coeffs[:, 5]

    def bx(v):  # (B,) -> (B, 1, 1)
        return v[:, None, None]

    s = np.sin(bx(n0) * x[None] + bx(n1) * y[None])
    c = np.cos(bx(n2_) * x[None] + bx(n3) * y[None])
    if validate_form:
        f1, f2 = bx(m0) + s, bx(m1) + c
    else:
        f1, f2 = bx(m0) * s, bx(m1) * c
    f_quad = np.stack([f1, f2], axis=-1)  # (B, nc, nq, 2)
    return _load_from_quad_values(space, f_quad, degree, dtype)


def assemble_load_constant(
    space: TaylorHoodSpace, f: tuple[float, float], degree: int = 4, dtype=np.float64
) -> np.ndarray:
    """Load vector for a constant forcing, e.g. (5, -5) or (0, 0)
    (reference: FEONet_time_dep_Stokes/assemble_fenics.py:111-115)."""
    xq = physical_quad_points(space, degree)
    ones = np.ones(xq.shape[:2])
    f_quad = np.stack([f[0] * ones, f[1] * ones], axis=-1)[None]
    return _load_from_quad_values(space, f_quad, degree, dtype)[0]


def assemble_load_from_velocity_values(
    space: TaylorHoodSpace,
    u1_vals: Array,
    u2_vals: Array,
    degree: int = 4,
    dtype=np.float64,
) -> np.ndarray:
    """Load vectors for forcing given as a P2 velocity FE function (GRF case).

    ∫ f·v with f = Σ_k f_k φ_k is the velocity mass matrix applied to the
    nodal values (reference: FEONet-square-with-hole/assemble_fenics.py:159-172
    builds a dolfin Function and assembles inner(f, v)*dx).
    u1_vals, u2_vals: (B, n2) nodal values. Returns (B, ng).
    """
    M = assemble_scalar_block(space, "mass", degree)
    l1 = np.asarray(u1_vals, dtype=np.float64) @ M.T
    l2 = np.asarray(u2_vals, dtype=np.float64) @ M.T
    B = l1.shape[0]
    return np.concatenate([l1, l2, np.zeros((B, space.n1))], axis=1).astype(dtype)


# ---------------------------------------------------------------------------
# Dirichlet BC row lifting (dolfin bc.apply semantics)
# ---------------------------------------------------------------------------


def apply_bc_matrix(A: Array, mask: Array) -> np.ndarray:
    """Zero the constrained rows and put 1 on their diagonal.

    Matches ``bc.apply(A)`` (reference: FEONet_Stokes_square/
    assemble_fenics.py:67-69). mask: (ng,) 1.0 where constrained.
    Accepts dense arrays or scipy sparse (returns the same kind).
    """
    from scipy.sparse import issparse

    mask = np.asarray(mask, dtype=np.float64)
    if issparse(A):
        from scipy.sparse import diags

        keep = diags(1.0 - mask)
        return (keep @ A.tocsr() + diags(mask)).tocsr()
    A = np.asarray(A, dtype=np.float64)
    return A * (1.0 - mask)[:, None] + np.diag(mask)


def apply_bc_vector(L: Array, mask: Array, values: Array) -> np.ndarray:
    """Set constrained entries of the load vector(s) to the BC values.

    Matches the RHS effect of ``bc.apply(A, L)`` (reference:
    FEONet_Stokes_square/assemble_fenics.py:130-131). Broadcasts over leading
    batch dims.
    """
    L = np.asarray(L, dtype=np.float64)
    mask = np.asarray(mask, dtype=np.float64)
    return L * (1.0 - mask) + np.asarray(values, dtype=np.float64) * mask
