"""The three weak-form residual losses (linear / nonlinear / rollout).

Conventions
-----------
* ``op`` is the (BC-applied) system matrix; with SPAI preconditioning pass
  ``op = A @ M`` — precomputed ONCE by the problem setup, not per step as the
  reference does (FEONet_Stokes_square/train_FEONet.py:264: `matrix@precond`
  inside the loss closure).
* Predictions are (B, ng) (steady) or (B, T, ng) (rollout).
* Every loss returns a scalar: total sum of squared residual entries —
  identical up to fusion to the reference's
  ``sum_i MSE_sum(LHS[:, i], RHS[:, i])`` per-DoF loop
  (train_FEONet.py:290-296).

Reference sign wart (steady NS): the no-precond branch of the reference
trains on ``A u + f - conv`` while the precond branch trains on
``A M u - f + conv`` (FEONet_steady_Navier-Stokes/train_FEONet.py:324-331 —
flagged in SURVEY.md). The physical system is A u + conv(u) = f; we implement
that, with ``reference_sign_bug=True`` available for bit-parity experiments.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

Array = jax.Array

# Residual matmuls run at FULL float32 precision: on TPU the default matmul
# precision decomposes f32 operands to bfloat16 passes, which floors the
# achievable Galerkin residual (and therefore rel-L2) around 1e-3 — the
# reference's cuBLAS runs true fp32. HIGHEST is the 6-pass compensated
# scheme; HIGH (3 passes) halves the MXU work of the residual stage (see
# docs/performance.md) and is selectable via FEONET_RESIDUAL_PRECISION=high
# or set_residual_precision() BEFORE the train step is first traced.
_PREC_BY_NAME = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}
_PREC = _PREC_BY_NAME[
    os.environ.get("FEONET_RESIDUAL_PRECISION", "highest").lower()
]


def set_residual_precision(name: str) -> None:
    """Set the matmul precision for all residual losses ('default' | 'high'
    | 'highest'). Precision is baked in at trace time — call before the
    Trainer jits its step."""
    global _PREC
    _PREC = _PREC_BY_NAME[name.lower()]


def _mm(x: Array, op_t: Array) -> Array:
    return jnp.matmul(x, op_t, precision=_PREC)


def _apply_op(x: Array, op) -> Array:
    """x @ A^T where `op` is a dense (ng, ng) array, a (BlockSparseOperator,
    BlockSparseOperator-transpose) pair — the Pallas block-sparse path for
    the ~50k-DoF stretch configs (ops/block_sparse.py) — or a
    ShardedBlockSparseOperator (row-block shards over the tensor-parallel
    model axis). Leading dims of x are flattened for the kernel and
    restored."""
    if isinstance(op, tuple):
        from ..ops.block_sparse import bsr_apply

        fwd, bwd = op
        flat = x.reshape(-1, x.shape[-1])
        return bsr_apply(flat, fwd, bwd).reshape(x.shape)
    from ..ops.block_sparse import ShardedBlockSparseOperator

    if isinstance(op, ShardedBlockSparseOperator):
        flat = x.reshape(-1, x.shape[-1])
        return op(flat).reshape(x.shape[:-1] + (op.ng,))
    return _mm(x, op.T)


def _masked_conv(u: Array, B1, B2, n2: int, conv_row_mask) -> Array:
    """Group-FEM convection with dense-or-BSR B1/B2 (see masked_convection
    in linalg/newton.py for the dense reference semantics)."""
    d1 = jnp.concatenate(
        [u[..., :n2], u[..., :n2], jnp.zeros_like(u[..., 2 * n2 :])], axis=-1
    )
    d2 = jnp.concatenate(
        [u[..., n2 : 2 * n2], u[..., n2 : 2 * n2], jnp.zeros_like(u[..., 2 * n2 :])],
        axis=-1,
    )
    conv = d1 * _apply_op(u, B1) + d2 * _apply_op(u, B2)
    if conv_row_mask is not None:
        conv = conv * (1.0 - conv_row_mask)
    return conv


def sum_of_squares(resid: Array) -> Array:
    """Total sum of squares in float32-accumulated precision."""
    return jnp.sum(jnp.square(resid))


def bpx_project(r: Array, G) -> Array:
    """G^T r — project a u-space residual into w-coordinates (the BPX
    congruence, linalg/bpx.py). `G` is the ops['bpx_G'] entry: a dense
    (ng, m) array or a (G, G^T) BlockSparseOperator pair."""
    if isinstance(G, tuple):
        from ..ops.block_sparse import bsr_apply

        flat = r.reshape(-1, r.shape[-1])
        out = bsr_apply(flat, G[1], G[0])  # the transpose operator
        return out.reshape(r.shape[:-1] + (out.shape[-1],))
    return _mm(r, G)


def linear_residual(pred: Array, op: Array, rhs: Array) -> Array:
    """Steady linear loss: || op @ u - rhs ||^2 summed over batch and DoFs.

    pred: (B, ng); op: (ng, ng); rhs: (B, ng).
    (reference weak_form + closure: FEONet_Stokes_square/
    train_FEONet.py:259-296 — one einsum + one reduction here.)
    """
    return sum_of_squares(_apply_op(pred, op) - rhs)


def nonlinear_residual(
    pred: Array,
    op: Array,
    rhs: Array,
    B1: Array,
    B2: Array,
    n2: int,
    conv_row_mask: Array | None = None,
    reference_sign_bug: bool = False,
    equil_dc: Array | None = None,
    equil_dr: Array | None = None,
    precond: Array | None = None,
    conv_scale: Array | float = 1.0,
) -> Array:
    """Steady Navier-Stokes loss: || op u + conv_scale * conv(u) - f ||^2.

    ``conv_scale`` is the training-time continuation knob (gamma ramps
    0 -> 1 over TrainConfig.conv_ramp_epochs): at 0 the objective is the
    well-conditioned Stokes residual, at 1 the true NS residual — the same
    homotopy linalg/newton.py uses for the ground-truth solves, applied to
    the learning objective.

    conv(u) is the diag-masked quadratic term (reference:
    FEONet_steady_Navier-Stokes/train_FEONet.py:301-332). When training with
    plain SPAI, pass op = A @ M; conv is evaluated on the RAW prediction
    (matching the reference, which applies the preconditioner on the linear
    term only — its NS runs disable SPAI, so the quirk never bites).

    Ruiz-equilibrated variant (equil_dc/equil_dr set): op = dr A dc [M],
    rhs = dr*f, predictions are û with u = dc∘(M û) — the quadratic term is
    evaluated on the PHYSICAL u (pass ``precond`` for the Ruiz∘SPAI
    composition) and its rows re-scaled by dr so the whole residual is
    dr∘(A u + conv(u) - f).
    """
    if equil_dc is not None:
        u_phys = _mm(pred, precond.T) if precond is not None else pred
        u_phys = u_phys * equil_dc
    else:
        u_phys = pred
    conv = conv_scale * _masked_conv(u_phys, B1, B2, n2, conv_row_mask)
    if equil_dr is not None:
        conv = conv * equil_dr
    if reference_sign_bug:
        resid = _apply_op(pred, op) + rhs - conv
    else:
        resid = _apply_op(pred, op) + conv - rhs
    return sum_of_squares(resid)


def _diag_pair(u: Array, n2: int) -> tuple[Array, Array]:
    z = jnp.zeros_like(u[..., 2 * n2 :])
    d1 = jnp.concatenate([u[..., :n2], u[..., :n2], z], axis=-1)
    d2 = jnp.concatenate(
        [u[..., n2 : 2 * n2], u[..., n2 : 2 * n2], z], axis=-1
    )
    return d1, d2


def nonlinear_defect_residual(
    pred: Array,
    op: Array,
    rhs: Array,
    B1: Array,
    B2: Array,
    n2: int,
    u0: Array,
    B1u0: Array,
    B2u0: Array,
    conv_row_mask: Array | None = None,
    equil_dc: Array | None = None,
    equil_dr: Array | None = None,
) -> Array:
    """Cascade stage-2 steady-NS loss: the group-FEM residual expanded about
    a frozen stage-1 state u0 (per-sample constants u0, B1u0 = B1 @ u0,
    B2u0 precomputed in f64 by Problem.defect_batch64):

        A e + d(u0)∘(B e) + d(e)∘(B u0) + conv(e) = r0

    with r0 = f - A u0 - conv(u0). Exact quadratic expansion — the combined
    prediction u0 + e satisfies the ORIGINAL residual up to f32 rounding.
    Equilibrated variant: predictions are ê (physical e = dc∘ê), all
    convective terms on physical states, rows re-scaled by dr.
    """
    e_phys = pred * equil_dc if equil_dc is not None else pred
    d1_0, d2_0 = _diag_pair(u0, n2)
    d1_e, d2_e = _diag_pair(e_phys, n2)
    B1e = _apply_op(e_phys, B1)
    B2e = _apply_op(e_phys, B2)
    cross = (
        d1_0 * B1e + d1_e * B1u0 + d1_e * B1e
        + d2_0 * B2e + d2_e * B2u0 + d2_e * B2e
    )
    if conv_row_mask is not None:
        cross = cross * (1.0 - conv_row_mask)
    if equil_dr is not None:
        cross = cross * equil_dr
    resid = _apply_op(pred, op) + cross - rhs
    return sum_of_squares(resid)


def ns_linearized_residual(
    pred_u: Array,
    truth_u: Array,
    A_raw,
    B1,
    B2,
    n2: int,
    conv_row_mask: Array | None = None,
    equil_dr: Array | None = None,
) -> Array:
    """Steady-NS residual linearized about the LABEL — the convex,
    root-unambiguous physics term for label-ANCHORED (hybrid) training:

        || dr ∘ J(u*) (u - u*) ||²,   J(u*) v = A v + keep∘(d(u*)∘Bv + d(v)∘Bu*)

    Because u* is a root of the nonlinear system (r(u*) = 0), this equals
    the true residual of u up to O(|u - u*|²) — but unlike the raw Galerkin
    residual it has EXACTLY ONE minimizer (u = u*), so it cannot pull the
    network toward spurious roots (the failure mode measured in
    runs/r2/RESULTS.md ns450_shift_rs: residual 1.3e-6 with coeff error
    0.77) nor destabilize a supervised anchor the way the resampled raw
    residual did (ns450_hysplit6k's finite 6e24 blow-up). Relative to plain
    supervised MSE it reweights the error by the J-metric: components that
    matter for the PDE (e.g. the pressure rows, which MSE under-weights by
    the coefficient-scale imbalance) are penalized at their physical weight.

    All arguments live in SOLUTION coordinates: pred_u = unmap(out),
    truth_u = the stable-branch label; A_raw is the BC-applied raw system
    (dense or BSR pair), NOT the preconditioned/equilibrated training
    operator. equil_dr row-scales the residual like the Galerkin losses.
    """
    v = pred_u - truth_u
    d1s, d2s = _diag_pair(truth_u, n2)
    d1v, d2v = _diag_pair(v, n2)
    cross = (
        d1s * _apply_op(v, B1) + d1v * _apply_op(truth_u, B1)
        + d2s * _apply_op(v, B2) + d2v * _apply_op(truth_u, B2)
    )
    if conv_row_mask is not None:
        cross = cross * (1.0 - conv_row_mask)
    r = _apply_op(v, A_raw) + cross
    if equil_dr is not None:
        r = r * equil_dr
    return sum_of_squares(r)


def rollout_residual(
    pred_seq: Array,
    S: Array,
    sys_op: Array,
    load: Array,
    dt: float,
    u_init: Array,
    precond: Array | None = None,
    equil_dc: Array | None = None,
    phys_weight: Array | None = None,
) -> Array:
    """Time-dependent Stokes rollout loss.

    For t = 1..T with u_0 = u_init and u_{t-1} = the *prediction* at t-1
    (self-conditioned rollout):

        resid_t = sys_op @ u_t - (S @ u_{t-1} + dt * f)

    where sys_op = (S + dt*A) (or (S + dt*A) @ M with SPAI). Loss = mean over
    t of the per-step sum of squares (reference weak_form_sequence + closure:
    FEONet_time_dep_Stokes/train_FEONet.py:343-400).

    The sequential dependency is only a one-step shift, so the whole rollout
    is two batched matmuls — no scan needed:
    RHS = [u_init, u_1..u_{T-1}] @ S^T + dt*f.

    pred_seq: (B, T, ng); u_init: (B, ng); load: (ng,) or (B, ng).

    With SPAI (sys_op = (S+dt*A) @ M) the predictions live in preconditioned
    coordinates û (physical u = M û), so the self-conditioning S-term must
    see M û_{t-1} — pass ``precond`` to keep the coordinates consistent
    (u_init is already physical). The reference never exercises this branch
    (its timedep runs default do_precond=0, train_FEONet.py:37).

    Ruiz-equilibrated variant (equil_dc set): sys_op = dr (S+dt·A) dc, S and
    load are ROW-scaled by dr by the caller, predictions are û with the
    physical u = dc∘û — the self-conditioning term sees dc∘û_{t-1}. This is
    the conditioning path for the label-free rollout: in (S+dt·A) the
    pressure rows/cols enter only through dt·A, so the raw residual
    under-weights pressure by dt² (cond ~3.5e5 at ne=200, dt=0.01 → ~90
    equilibrated).
    """
    prev_pred = pred_seq[:, :-1, :]
    if precond is not None:
        prev_pred = _mm(prev_pred, precond.T)
    if equil_dc is not None:  # composes with precond: u = dc ∘ (M û)
        prev_pred = prev_pred * equil_dc
    prev = jnp.concatenate([u_init[:, None, :], prev_pred], axis=1)
    lhs = _apply_op(pred_seq, sys_op)
    if load.ndim == pred_seq.ndim:  # per-step RHS (B, T, ng) — cascade path
        f_term = dt * load
    else:
        f_term = dt * jnp.broadcast_to(
            load, pred_seq.shape[:1] + load.shape[-1:]
        )[:, None, :]
    rhs = _apply_op(prev, S) + f_term
    resid = lhs - rhs
    if phys_weight is not None:
        # PHYSICAL-error metric (ProblemConfig.rollout_metric='physical'):
        # dc∘(M r̂) = (S+dt·A)^{-1} dr^{-1} r̂ is the per-step solution error
        # itself (exact with precond_mode='exact'), so the loss measures
        # ||W ∘ e_u||² per component instead of the equation-space
        # ||dr(S+dt·A)e_u||², which under-weights pressure directions by
        # the dt·A factor. Still label-free.
        resid = _mm(resid, precond.T)
        if equil_dc is not None:
            resid = resid * equil_dc
        resid = resid * phys_weight
    per_t = jnp.sum(jnp.square(resid), axis=(0, 2))
    return jnp.mean(per_t)


def rollout_ns_defect_residual(
    pred_seq: Array,
    S: Array,
    sys_op: Array,
    load: Array,
    dt: float,
    B1: Array,
    B2: Array,
    n2: int,
    u0_prev: Array,
    B1u0p: Array,
    B2u0p: Array,
    conv_row_mask: Array | None = None,
    precond: Array | None = None,
    equil_dc: Array | None = None,
    equil_dr: Array | None = None,
) -> Array:
    """Cascade stage-2 semi-implicit NS rollout loss: the residual expanded
    about a frozen stage-1 trajectory. With ep the LAGGED physical
    correction (0 at t=0) and u0p the lagged physical stage-1 state
    (per-sample constants u0_prev, B1u0p = B1 u0p, B2u0p precomputed in f64
    by Problem.defect_batch64):

        sys e_t - S ep + dt[d(u0p)∘(B ep) + d(ep)∘(B u0p) + conv(ep)] = -r0_t

    load carries -r0/dt (per-step, (B, T, ng)), matching rollout_residual's
    cascade convention; the expansion is exact (group-FEM is quadratic).
    """
    prev_pred = pred_seq[:, :-1, :]
    if precond is not None:
        prev_pred = _mm(prev_pred, precond.T)
    if equil_dc is not None:
        prev_pred = prev_pred * equil_dc
    ep = jnp.concatenate(
        [jnp.zeros_like(prev_pred[:, :1]), prev_pred], axis=1
    )
    d1_0, d2_0 = _diag_pair(u0_prev, n2)
    d1_e, d2_e = _diag_pair(ep, n2)
    B1e = _apply_op(ep, B1)
    B2e = _apply_op(ep, B2)
    cross = (
        d1_0 * B1e + d1_e * B1u0p + d1_e * B1e
        + d2_0 * B2e + d2_e * B2u0p + d2_e * B2e
    )
    if conv_row_mask is not None:
        cross = cross * (1.0 - conv_row_mask)
    if equil_dr is not None:
        cross = cross * equil_dr
    lhs = _apply_op(pred_seq, sys_op)
    rhs = _apply_op(ep, S) + dt * (load - cross)
    per_t = jnp.sum(jnp.square(lhs - rhs), axis=(0, 2))
    return jnp.mean(per_t)


def rollout_ns_residual(
    pred_seq: Array,
    S: Array,
    sys_op: Array,
    load: Array,
    dt: float,
    u_init: Array,
    B1: Array,
    B2: Array,
    n2: int,
    conv_row_mask: Array | None = None,
    precond: Array | None = None,
    equil_dc: Array | None = None,
    equil_dr: Array | None = None,
    conv_scale: Array | float = 1.0,
    phys_weight: Array | None = None,
) -> Array:
    """Semi-implicit Navier-Stokes rollout loss (stretch capability — no
    reference counterpart; scheme matches linalg.solvers.
    semi_implicit_ns_rollout):

        resid_t = sys_op u_t - (S u_{t-1} + dt * (f - conv(u_{t-1})))

    with the group-FEM convection on the lagged *prediction* — fully
    parallel over t (one-step shift, two matmuls + the masked quadratic).

    Equilibrated variant: see rollout_residual — additionally the quadratic
    term is evaluated on the physical lagged state and row-scaled by dr.
    """
    prev_pred = pred_seq[:, :-1, :]
    if precond is not None:
        prev_pred = _mm(prev_pred, precond.T)
    if equil_dc is not None:  # composes with precond: u = dc ∘ (M û)
        prev_pred = prev_pred * equil_dc
    prev = jnp.concatenate([u_init[:, None, :], prev_pred], axis=1)
    conv = conv_scale * _masked_conv(prev, B1, B2, n2, conv_row_mask)
    if equil_dr is not None:
        conv = conv * equil_dr
    lhs = _apply_op(pred_seq, sys_op)
    rhs = _apply_op(prev, S) + dt * (
        jnp.broadcast_to(load, pred_seq.shape[:1] + load.shape[-1:])[:, None, :] - conv
    )
    resid = lhs - rhs
    if phys_weight is not None:
        # physical-error metric — see rollout_residual (the inverse is of
        # the linear implicit part; the lagged convection sits on the RHS)
        resid = _mm(resid, precond.T)
        if equil_dc is not None:
            resid = resid * equil_dc
        resid = resid * phys_weight
    per_t = jnp.sum(jnp.square(resid), axis=(0, 2))
    return jnp.mean(per_t)
