"""PyTorch-default parameter initializers for flax modules.

The reference's ``weights_init`` applies kaiming-normal to ``nn.Conv1d`` only
(FEONet_Stokes_square/train_FEONet.py:172-180) — a no-op for every 2D model —
so the reference effectively trains from *torch default* init:

    weight ~ kaiming_uniform(a=sqrt(5))  ==  U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    bias   ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))

(torch.nn.Linear/ConvNd reset_parameters). flax defaults differ (lecun-normal
kernels, ZERO bias), which changes the optimization trajectory; these
initializers make the init distributions match torch so training parity is
init-for-init. Used inline by models/steady.py and models/temporal.py —
fan_in is computed at the call site where the input shape is known.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

# kaiming_uniform(a=sqrt(5)) == U(-b, b), b = sqrt(6 / ((1 + a^2) fan_in))
#                             == U(-1/sqrt(fan_in), 1/sqrt(fan_in))
# == variance_scaling(scale=1/3, fan_in, uniform): bound = sqrt(3*scale/fan_in)
torch_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def torch_bias_init(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch's bias reset rule."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def conv_inits(x, kernel) -> dict:
    """kwargs for nn.Conv matching torch ConvNd defaults (NHWC input x)."""
    fan_in = x.shape[-1] * math.prod(kernel)
    return dict(kernel_init=torch_kernel_init, bias_init=torch_bias_init(fan_in))


def conv_transpose_inits(out_features: int, kernel) -> dict:
    """kwargs for nn.ConvTranspose matching torch ConvTransposeNd defaults.

    torch's ConvTranspose2d weight is (in, out, kH, kW); its fan_in (dim-1
    convention) is out_ch * prod(kernel).
    """
    fan_in = out_features * math.prod(kernel)
    return dict(kernel_init=torch_kernel_init, bias_init=torch_bias_init(fan_in))


def dense_inits(x) -> dict:
    """kwargs for nn.Dense matching torch Linear defaults."""
    fan_in = x.shape[-1]
    return dict(kernel_init=torch_kernel_init, bias_init=torch_bias_init(fan_in))
