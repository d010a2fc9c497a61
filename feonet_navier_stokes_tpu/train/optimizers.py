"""Optimizer factories (reference zoo: LBFGS/Adam/SGD/AdamW/Adagrad,
FEONet_Stokes_square/train_FEONet.py:210-253).

Note the reference's LBFGS is broken — ``optimizer.step(loss.item)`` passes a
pseudo-closure so LBFGS never re-evaluates (SURVEY.md C21); optax.lbfgs here
is a real implementation but Adam/AdamW remain the de-facto choices.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
import optax

OPTIMIZERS = ("adam", "adamw", "sgd", "adagrad", "lbfgs", "adafactor")
SCHEDULES = ("constant", "cosine", "exponential", "warmup_cosine")
MOMENT_DTYPES = ("float32", "bfloat16")


def _cheap_rbits(shape, count, salt: int):
    """Counter-based uint32 dither for stochastic rounding: murmur3-finalizer
    hash of (element index, step count, leaf salt). A few fused integer ops
    per element — no threefry traffic, which matters because the whole point
    of low-precision moments is saving HBM bandwidth on ~1e8-element trees."""
    n = int(np.prod(shape)) if shape else 1
    i = lax.iota(jnp.uint32, n).reshape(shape)
    h = i * jnp.uint32(0x9E3779B1) + count.astype(jnp.uint32) * jnp.uint32(
        0x85EBCA6B
    ) + jnp.uint32(salt * 0x27D4EB2F + 0x165667B1)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _sr_to_bf16(x, rbits):
    """Stochastically round f32 -> bf16: add 16 random bits below the bf16
    mantissa boundary, truncate. Unbiased (E[cast(x)] = x), so the tiny
    (1-b2)*g^2 second-moment increments that round-to-nearest would swallow
    (ulp/2 = 2^-9 rel ~ 2e-3 > 1e-3) survive in expectation."""
    bits = lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    bits = bits + (rbits & jnp.uint32(0xFFFF))
    bits = bits & jnp.uint32(0xFFFF0000)
    return lax.bitcast_convert_type(bits, jnp.float32).astype(jnp.bfloat16)


def scale_by_adam_lowp(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    moment_dtype=jnp.bfloat16,
) -> optax.GradientTransformation:
    """Adam with BOTH moments stored in ``moment_dtype`` (bf16): the opt-in
    single-chip lever for the optimizer-bandwidth-bound BSR-47k step, where
    Adam state traffic is ~4.2 GB/step on a 1.5-3e8-param head
    (docs/performance.md §BSR). Update math runs in f32; only the stored
    moments are low-precision, cast back with stochastic rounding. The
    default optimizer stays exact-Adam-f32 for reference parity (C21,
    FEONet_Stokes_square/train_FEONet.py:219-226)."""

    def init(params):
        zeros = lambda p: jnp.zeros(jnp.shape(p), dtype=moment_dtype)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        leaves_g, treedef = jax.tree.flatten(updates)
        leaves_m = treedef.flatten_up_to(state.mu)
        leaves_n = treedef.flatten_up_to(state.nu)
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        out_u, out_m, out_n = [], [], []
        for salt, (g, m, n) in enumerate(zip(leaves_g, leaves_m, leaves_n)):
            g = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g
            n32 = b2 * n.astype(jnp.float32) + (1.0 - b2) * g * g
            upd = (m32 / bc1) / (jnp.sqrt(n32 / bc2) + eps)
            rb = _cheap_rbits(g.shape, count, salt)
            out_u.append(upd)
            out_m.append(_sr_to_bf16(m32, rb))
            # decorrelate the nu dither from the mu dither for free
            out_n.append(_sr_to_bf16(n32, rb ^ jnp.uint32(0x5851F42D)))
        new_state = optax.ScaleByAdamState(
            count=count,
            mu=jax.tree.unflatten(treedef, out_m),
            nu=jax.tree.unflatten(treedef, out_n),
        )
        return jax.tree.unflatten(treedef, out_u), new_state

    return optax.GradientTransformation(init, update)


def build_schedule(
    lr: float,
    schedule: str = "constant",
    total_steps: int = 0,
    final_fraction: float = 0.01,
):
    """LR schedule. The reference trains at a CONSTANT lr (torch Adam with no
    scheduler, train_FEONet.py:219-226), which produces the late-training
    loss spikes visible in full-batch runs; cosine/exponential decay to
    ``final_fraction * lr`` over ``total_steps`` is offered as the
    better-practice alternative (off by default for parity)."""
    schedule = schedule.lower()
    if schedule == "constant" or total_steps <= 0:
        return lr
    if schedule == "cosine":
        return optax.cosine_decay_schedule(lr, total_steps, alpha=final_fraction)
    if schedule == "warmup_cosine":
        # linear 0->lr over the first 2% of the budget, then cosine to
        # final_fraction*lr — tames the early full-batch loss spikes that
        # burned 2/3 of the round-2 ns450_unet6k budget (its loss hit 160
        # at cosine-peak lr before the late-decay descent)
        warmup = max(1, total_steps // 50)
        return optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup, total_steps, end_value=final_fraction * lr
        )
    if schedule == "exponential":
        return optax.exponential_decay(
            lr, total_steps, final_fraction, staircase=False
        )
    raise ValueError(f"unknown schedule {schedule!r}; have {SCHEDULES}")


def build_optimizer(
    name: str,
    lr=1e-3,
    weight_decay: float = 1e-4,
    momentum: float = 0.9,
    grad_clip: float = 0.0,
    moment_dtype: str = "float32",
) -> optax.GradientTransformation:
    """grad_clip > 0 prepends global-norm clipping — the stabilizer for the
    full-batch residual objectives, whose loss landscape produces the
    late-training spikes the reference's constant-lr runs show (and which
    recur on the BPX-conditioned 47k objective at cosine-peak lr).

    moment_dtype='bfloat16' (adam only) stores Adam moments in bf16 with
    stochastically-rounded casts — see scale_by_adam_lowp."""
    name = name.lower()
    if moment_dtype not in MOMENT_DTYPES:
        raise ValueError(
            f"unknown moment_dtype {moment_dtype!r}; have {MOMENT_DTYPES}"
        )
    if moment_dtype != "float32" and name != "adam":
        raise ValueError("moment_dtype='bfloat16' is only supported for adam")
    if name == "adam" and moment_dtype == "bfloat16":
        tx = optax.chain(
            scale_by_adam_lowp(moment_dtype=jnp.bfloat16),
            optax.scale_by_learning_rate(lr),
        )
    elif name == "adam":
        tx = optax.adam(lr)
    elif name == "adamw":
        tx = optax.adamw(lr, weight_decay=weight_decay)
    elif name == "sgd":
        tx = optax.sgd(lr, momentum=momentum)
    elif name == "adagrad":
        tx = optax.adagrad(lr)
    elif name == "adafactor":
        # Factored second moment: (m,) + (n,) row/col statistics instead of
        # a full (m, n) accumulator, and no first moment. The opt-in lever
        # for the optimizer-BANDWIDTH-bound BSR-47k step (docs/performance.md
        # §BSR): Adam moves ~28 B/param/step of HBM traffic, adafactor ~12 —
        # bf16 moments only shrank capacity, not steps/s (BENCH r3 smoke).
        # Default stays Adam for reference parity (C21).
        tx = optax.adafactor(learning_rate=lr,
                             multiply_by_parameter_scale=False,
                             clipping_threshold=None)
    elif name == "lbfgs":
        tx = optax.lbfgs(lr if not callable(lr) else None)
    else:
        raise ValueError(f"unknown optimizer {name!r}; have {OPTIMIZERS}")
    if grad_clip and grad_clip > 0:
        if name == "lbfgs":
            raise ValueError(
                "grad_clip is incompatible with lbfgs (clipping the gradient "
                "would corrupt the curvature pairs); use grad_clip=0"
            )
        return optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx
