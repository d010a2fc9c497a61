"""On-device (jit/vmap) load-vector assembly — the training-time path.

The host float64 assemblers in fem/assemble.py are the GROUND-TRUTH
contract (create_data.py parity, exactness pins); but per-sample LOAD
assembly is also *training-time* work in the ``resample_every``
infinite-data regime — the reference's hot loop
(FEONet_Stokes_square/assemble_fenics.py:128-135 assembles one FEniCS load
per sample, on CPU) — and this VM has ONE host core. This module is the
BASELINE.json north-star's "jit-compiled element-kernel assembler with
segment-sum scatter" made real where it matters at train time:

  * sincos forcing: evaluate f at the (static) physical quadrature points,
    contract with the P2 test functions per element (one einsum on the MXU)
    and scatter with ``jax.ops.segment_sum`` — identical math to
    fem/assemble.py:assemble_load_sincos at the training dtype;
  * GRF forcing: the load is the velocity mass matrix applied to nodal
    values — one batched matmul against the (static) mass blocks.

Device and host paths agree to f32 rounding (tests/test_device_assemble.py
pins ~1e-6 relative); ground truth keeps the host f64 route unconditionally
(f64 never touches the device — CLAUDE.md rule).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.taylor_hood import TaylorHoodSpace
from .assemble import (_phys_grad_p2, _tabulate, assemble_scalar_block,
                       physical_quad_points)

__all__ = ["make_device_load_sincos", "make_device_load_grf"]


def make_device_load_sincos(
    space: TaylorHoodSpace,
    bc_mask: np.ndarray | None = None,
    bc_values: np.ndarray | None = None,
    degree: int = 7,
    dtype=jnp.float32,
    validate_form: bool = False,
) -> Callable:
    """Build a jit-able ``loads = fn(coeffs)`` for the sincos forcing.

    coeffs: (B, 6) = (m0, m1, n0, n1, n2, n3);
    f = (m0 sin(n0 x + n1 y), m1 cos(n2 x + n3 y))
    (reference FEONet_Stokes_square/assemble_fenics.py:123-129). Returns
    (B, ng) BC-applied loads at ``dtype`` when bc_mask/values are given,
    raw loads otherwise. All constants are baked as device arrays; the
    returned function is pure and safe to close over inside a jitted
    training step (resample path).
    """
    _, _, _, _, v2, _ = _tabulate(degree)
    _, wdet = _phys_grad_p2(space, degree)
    xq = physical_quad_points(space, degree)  # (nc, nq, 2)
    wphi = np.einsum("cq,qi->cqi", wdet, np.asarray(v2))  # (nc, nq, 6)
    n2, n1, ng = space.n2, space.n1, space.ng
    nc = space.mesh.num_cells

    x_d = jnp.asarray(xq[..., 0], dtype)  # (nc, nq)
    y_d = jnp.asarray(xq[..., 1], dtype)
    wphi_d = jnp.asarray(wphi, dtype)
    seg_ids = jnp.asarray(space.cell_dofs_p2.reshape(-1))  # (nc*6,)
    mask_d = None if bc_mask is None else jnp.asarray(bc_mask, dtype)
    vals_d = None if bc_values is None else jnp.asarray(bc_values, dtype)

    def one(c):  # (6,) -> (ng,)
        m0, m1, n0, n1_, n2_, n3 = c[0], c[1], c[2], c[3], c[4], c[5]
        ph1 = n0 * x_d + n1_ * y_d
        ph2 = n2_ * x_d + n3 * y_d
        if validate_form:  # reference val-set variant: m + sin/cos
            f1 = m0 + jnp.sin(ph1)
            f2 = m1 + jnp.cos(ph2)
        else:
            f1 = m0 * jnp.sin(ph1)
            f2 = m1 * jnp.cos(ph2)
        el1 = jnp.einsum("cqi,cq->ci", wphi_d, f1).reshape(nc * 6)
        el2 = jnp.einsum("cqi,cq->ci", wphi_d, f2).reshape(nc * 6)
        l1 = jax.ops.segment_sum(el1, seg_ids, num_segments=n2)
        l2 = jax.ops.segment_sum(el2, seg_ids, num_segments=n2)
        load = jnp.concatenate([l1, l2, jnp.zeros(n1, dtype)])
        if mask_d is not None:
            load = load * (1.0 - mask_d) + mask_d * vals_d
        return load

    return jax.vmap(one)


def make_device_load_grf(
    space: TaylorHoodSpace,
    bc_mask: np.ndarray | None = None,
    bc_values: np.ndarray | None = None,
    degree: int = 4,
    dtype=jnp.float32,
) -> Callable:
    """Build a jit-able ``loads = fn(u1_vals, u2_vals)`` for GRF forcing.

    The load of a forcing given as a P2 FE function is the velocity mass
    matrix applied to its nodal values (fem/assemble.py:
    assemble_load_from_velocity_values) — on device this is one batched
    matmul against the static (n2, n2) mass block. Dense-scale path (the
    BSR stretch keeps loads on the host f64 route).
    """
    M2 = assemble_scalar_block(space, "mass", degree)  # (n2, n2)
    M2_d = jnp.asarray(np.asarray(M2, dtype=np.float64), dtype)
    n1 = space.n1
    mask_d = None if bc_mask is None else jnp.asarray(bc_mask, dtype)
    vals_d = None if bc_values is None else jnp.asarray(bc_values, dtype)

    def fn(u1_vals, u2_vals):  # (B, n2) x2 -> (B, ng)
        l1 = jnp.matmul(u1_vals, M2_d.T,
                        precision=jax.lax.Precision.HIGHEST)
        l2 = jnp.matmul(u2_vals, M2_d.T,
                        precision=jax.lax.Precision.HIGHEST)
        B = u1_vals.shape[0]
        load = jnp.concatenate([l1, l2, jnp.zeros((B, n1), dtype)], axis=1)
        if mask_d is not None:
            load = load * (1.0 - mask_d) + mask_d * vals_d
        return load

    return fn
