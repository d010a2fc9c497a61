"""True (quadrature-exact) Navier-Stokes convection: residual + Jacobian.

The reference has TWO discrete convection operators:

  1. the *training* system's "group FEM" approximation
     conv(u) = d1(u) * (B1 u) + d2(u) * (B2 u) with nodal-collocated
     velocity weights (FEONet_steady_Navier-Stokes/train_FEONet.py:301-332,
     assemble_fenics.py:92-98) — see linalg/newton.py;
  2. the *ground-truth* weak trilinear form c(u;u,v) = ∫ (u·∇)u · v dx that
     FEniCS's Newton solves (assemble_fenics.py:190-196:
     ``dot(dot(grad(u), u), v) * dx``).

The two differ by a quadrature/representation error ~1.7e-3 in relative
residual (compare_ordering_nonlinear.ipynb cells 19/33) — which is why the
ground-truth solver here assembles the TRUE form: evaluate u and ∇u at
quadrature points, form (u·∇)u, integrate against the P2 test functions, and
assemble the exact Gateaux-derivative Jacobian

    J_conv[i,j] = ∫ [ (φ_j e_c)·∇u + u·∇(φ_j e_c) ] · φ_i dx

as four n2 x n2 element-einsum blocks with the same segment-sum scatter as
the linear forms.

Host-side numpy float64 throughout: this is ground-truth machinery (Newton
solves, IMEX rollouts) that must be exact regardless of the JAX backend —
see fem/assemble.py's placement rationale. The *training* convection (group
FEM) stays on-device in residual/losses.py.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from ..geometry.taylor_hood import TaylorHoodSpace
from .assemble import (
    _tabulate,
    _phys_grad_p2,
    make_block_scatter,
    scatter_add_dense,
    _p2_scatter_matrix,
)

Array = np.ndarray


def make_true_convection(
    space: TaylorHoodSpace, degree: int = 4
) -> tuple[Callable[[Array], Array], Callable[[Array], Array]]:
    """Build (conv_fn, jac_fn) for the weak trilinear convection (numpy f64).

    conv_fn(u):  (..., ng) -> (..., ng)   c_i(u) = ∫ (u·∇)u · φ_i
    jac_fn(u):   (ng,)     -> (ng, ng)    dc/du (velocity blocks only)

    Pressure rows are zero; BC-row masking is the caller's job (the solver
    multiplies by (1 - mask)).
    """
    pts, wts, v1, _, v2, _ = _tabulate(degree)
    gp, wdet = _phys_grad_p2(space, degree)  # (nc,nq,6,2), (nc,nq)
    v2j = np.asarray(v2, dtype=np.float64)  # (nq, 6)
    dofs = space.cell_dofs_p2  # (nc, 6)
    n2, n1, ng = space.n2, space.n1, space.ng
    nc = space.mesh.num_cells
    P = _p2_scatter_matrix(space)  # (n2, nc*6) CSR
    plan22 = make_block_scatter(dofs, dofs, n2, n2)

    def _at_quad(u_flat: Array):
        """nodal (ng,) -> per-quad velocity values and gradients."""
        u1e = u_flat[:n2][dofs]  # (nc, 6)
        u2e = u_flat[n2 : 2 * n2][dofs]
        u1q = np.einsum("qi,ci->cq", v2j, u1e)
        u2q = np.einsum("qi,ci->cq", v2j, u2e)
        gu1 = np.einsum("cqid,ci->cqd", gp, u1e)  # (nc, nq, 2)
        gu2 = np.einsum("cqid,ci->cqd", gp, u2e)
        return u1q, u2q, gu1, gu2

    def conv_one(u_flat: Array) -> Array:
        u1q, u2q, gu1, gu2 = _at_quad(u_flat)
        c1 = u1q * gu1[..., 0] + u2q * gu1[..., 1]  # (nc, nq)
        c2 = u1q * gu2[..., 0] + u2q * gu2[..., 1]
        el1 = np.einsum("cq,qi,cq->ci", wdet, v2j, c1)  # (nc, 6)
        el2 = np.einsum("cq,qi,cq->ci", wdet, v2j, c2)
        l1 = P @ el1.reshape(-1)
        l2 = P @ el2.reshape(-1)
        return np.concatenate([l1, l2, np.zeros(n1)])

    def conv_fn(u: Array) -> Array:
        u = np.asarray(u, dtype=np.float64)
        if u.ndim == 1:
            return conv_one(u)
        flat = u.reshape(-1, ng)
        return np.stack([conv_one(x) for x in flat]).reshape(u.shape)

    def jac_fn(u_flat: Array) -> Array:
        u_flat = np.asarray(u_flat, dtype=np.float64)
        u1q, u2q, gu1, gu2 = _at_quad(u_flat)
        # advective trial derivative: a ∂xφ_j + b ∂yφ_j (same for both blocks)
        adv = u1q[..., None] * gp[..., 0] + u2q[..., None] * gp[..., 1]  # (nc,nq,6)
        wphi = np.einsum("cq,qi->cqi", wdet, v2j)  # (nc, nq, 6) = w|J| φ_i
        e11 = np.einsum("cqi,cqj->cij", wphi, gu1[..., 0][..., None] * v2j[None] + adv)
        e12 = np.einsum("cqi,cq,qj->cij", wphi, gu1[..., 1], v2j)
        e21 = np.einsum("cqi,cq,qj->cij", wphi, gu2[..., 0], v2j)
        e22 = np.einsum("cqi,cqj->cij", wphi, gu2[..., 1][..., None] * v2j[None] + adv)
        J = np.zeros((ng, ng))
        J[:n2, :n2] = scatter_add_dense(e11, plan22)
        J[:n2, n2 : 2 * n2] = scatter_add_dense(e12, plan22)
        J[n2 : 2 * n2, :n2] = scatter_add_dense(e21, plan22)
        J[n2 : 2 * n2, n2 : 2 * n2] = scatter_add_dense(e22, plan22)
        return J

    return conv_fn, jac_fn


def make_convection_pair(
    space: TaylorHoodSpace, degree: int = 4, dtype=np.float64,
    chunk: int = 2048,
) -> Callable[[Array, Array], Array]:
    """Bilinear convection ``Q(a, b)_i = ∫ (a·∇)b · φ_i dx`` (batched numpy).

    The polarization pieces of the weak trilinear form: ``conv_fn(u) ==
    Q(u, u)`` with ``conv_fn`` from :func:`make_true_convection` (same
    quadrature). The defect correctors (linalg/ns_corrector.py) need the
    individual bilinear terms ``Q(u0, e) + Q(e, u0) + Q(e, e)`` so that the
    small-magnitude convection increment is computed WITHOUT the
    catastrophic f32 cancellation of ``conv(u0 + e) - conv(u0)``.

    ``dtype=float32`` builds a float32 evaluation path — the op class of a
    deployed solver-free corrector (einsums + gather/scatter only);
    ``float64`` matches ``make_true_convection`` to machine precision.

    a, b: (..., ng) arrays; returns (..., ng). Leading dims are flattened
    and processed in ``chunk``-row blocks to bound the (B, nc, nq) buffers.
    """
    _, _, _, _, v2, _ = _tabulate(degree)
    gp64, wdet64 = _phys_grad_p2(space, degree)
    v2j = np.asarray(v2, dtype=dtype)  # (nq, 6)
    gp = np.asarray(gp64, dtype=dtype)  # (nc, nq, 6, 2)
    wdet = np.asarray(wdet64, dtype=dtype)  # (nc, nq)
    dofs = space.cell_dofs_p2  # (nc, 6)
    n2, n1, ng = space.n2, space.n1, space.ng
    P = _p2_scatter_matrix(space).astype(dtype)  # (n2, nc*6) CSR
    wphi = np.einsum("cq,qi->cqi", wdet, v2j)  # (nc, nq, 6)

    def pair_chunk(a: Array, b: Array) -> Array:
        """(B, ng) x (B, ng) -> (B, ng)."""
        B = a.shape[0]
        a1e = a[:, :n2][:, dofs]  # (B, nc, 6)
        a2e = a[:, n2 : 2 * n2][:, dofs]
        b1e = b[:, :n2][:, dofs]
        b2e = b[:, n2 : 2 * n2][:, dofs]
        a1q = np.einsum("qi,bci->bcq", v2j, a1e)  # (B, nc, nq)
        a2q = np.einsum("qi,bci->bcq", v2j, a2e)
        gb1 = np.einsum("cqid,bci->bcqd", gp, b1e)  # (B, nc, nq, 2)
        gb2 = np.einsum("cqid,bci->bcqd", gp, b2e)
        c1 = a1q * gb1[..., 0] + a2q * gb1[..., 1]
        c2 = a1q * gb2[..., 0] + a2q * gb2[..., 1]
        el1 = np.einsum("cqi,bcq->bci", wphi, c1)  # (B, nc, 6)
        el2 = np.einsum("cqi,bcq->bci", wphi, c2)
        out = np.zeros((B, ng), dtype=dtype)
        out[:, :n2] = (P @ el1.reshape(B, -1).T).T
        out[:, n2 : 2 * n2] = (P @ el2.reshape(B, -1).T).T
        return out

    def pair_fn(a: Array, b: Array) -> Array:
        a = np.asarray(a, dtype=dtype)
        b = np.asarray(b, dtype=dtype)
        shape = a.shape
        a2d = a.reshape(-1, ng)
        b2d = b.reshape(-1, ng)
        out = np.empty_like(a2d)
        for lo in range(0, a2d.shape[0], chunk):
            hi = min(lo + chunk, a2d.shape[0])
            out[lo:hi] = pair_chunk(a2d[lo:hi], b2d[lo:hi])
        return out.reshape(shape)

    return pair_fn
