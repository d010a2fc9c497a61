"""Optimizer factories (reference zoo: LBFGS/Adam/SGD/AdamW/Adagrad,
FEONet_Stokes_square/train_FEONet.py:210-253).

Note the reference's LBFGS is broken — ``optimizer.step(loss.item)`` passes a
pseudo-closure so LBFGS never re-evaluates (SURVEY.md C21); optax.lbfgs here
is a real implementation but Adam/AdamW remain the de-facto choices.
"""

from __future__ import annotations

import optax

OPTIMIZERS = ("adam", "adamw", "sgd", "adagrad", "lbfgs")
SCHEDULES = ("constant", "cosine", "exponential", "warmup_cosine")


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
) -> optax.GradientTransformation:
    """grad_clip > 0 prepends global-norm clipping — the stabilizer for the
    full-batch residual objectives, whose loss landscape produces the
    late-training spikes the reference's constant-lr runs show (and which
    recur on the BPX-conditioned 47k objective at cosine-peak lr)."""
    name = name.lower()
    if name == "adam":
        tx = optax.adam(lr)
    elif name == "adamw":
        tx = optax.adamw(lr, weight_decay=weight_decay)
    elif name == "sgd":
        tx = optax.sgd(lr, momentum=momentum)
    elif name == "adagrad":
        tx = optax.adagrad(lr)
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
