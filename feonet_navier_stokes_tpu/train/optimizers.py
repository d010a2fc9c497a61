"""Optimizer factories (reference zoo: LBFGS/Adam/SGD/AdamW/Adagrad,
FEONet_Stokes_square/train_FEONet.py:210-253).

Note the reference's LBFGS is broken — ``optimizer.step(loss.item)`` passes a
pseudo-closure so LBFGS never re-evaluates (SURVEY.md C21); optax.lbfgs here
is a real implementation but Adam/AdamW remain the de-facto choices.
"""

from __future__ import annotations

import optax

OPTIMIZERS = ("adam", "adamw", "sgd", "adagrad", "lbfgs")


def build_optimizer(
    name: str,
    lr: float = 1e-3,
    weight_decay: float = 1e-4,
    momentum: float = 0.9,
) -> optax.GradientTransformation:
    name = name.lower()
    if name == "adam":
        return optax.adam(lr)
    if name == "adamw":
        return optax.adamw(lr, weight_decay=weight_decay)
    if name == "sgd":
        return optax.sgd(lr, momentum=momentum)
    if name == "adagrad":
        return optax.adagrad(lr)
    if name == "lbfgs":
        return optax.lbfgs(lr)
    raise ValueError(f"unknown optimizer {name!r}; have {OPTIMIZERS}")
