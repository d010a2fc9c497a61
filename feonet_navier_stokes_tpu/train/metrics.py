"""Validation metrics: the reference's relative-L2 suite.

(reference: rel_L2_error FEONet_Stokes_square/train_FEONet.py:304-305,
component breakdown :433-442; trajectory relative_L2
FEONet_time_dep_Stokes/train_FEONet.py:409-416.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def rel_l2_error(pred: Array, true: Array, axis: int = -1) -> Array:
    """Per-sample relative L2: sqrt(sum (t-p)^2 / sum t^2) along ``axis``."""
    num = jnp.sum((true - pred) ** 2, axis=axis)
    den = jnp.sum(true**2, axis=axis)
    return jnp.sqrt(num / jnp.maximum(den, 1e-30))


def component_errors(
    pred: Array, true: Array, n2: int
) -> dict[str, Array]:
    """Mean rel-L2 for u1 / u2 / p blocks + the full coefficient vector."""
    out = {}
    slices = {
        "u1": (0, n2),
        "u2": (n2, 2 * n2),
        "p": (2 * n2, None),
    }
    for name, (a, b) in slices.items():
        out[name] = jnp.mean(rel_l2_error(pred[..., a:b], true[..., a:b]))
    out["coeff"] = jnp.mean(rel_l2_error(pred, true))
    return out


def trajectory_rel_l2(pred_seq: Array, true_seq: Array) -> Array:
    """Mean over time and batch of per-step relative L2 norms
    (reference relative_L2: ||p-t|| / (||t|| + 1e-12), mean over T, batch)."""
    num = jnp.linalg.norm(pred_seq - true_seq, axis=-1)
    den = jnp.linalg.norm(true_seq, axis=-1) + 1e-12
    return jnp.mean(num / den)
