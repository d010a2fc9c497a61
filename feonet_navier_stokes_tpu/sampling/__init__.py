"""Problem-instance samplers: parametric forcing, Gaussian random fields, and
initial conditions — jax.random based, matching the reference distributions."""

from .forcing import (
    sample_sincos_coeffs,
    sincos_on_grid,
    sincos_at_points,
    input_grid_points,
)
from .grf import (
    rbf_kernel,
    grf_cholesky,
    grf_factor,
    sample_grf,
    GridInterpolator,
)
from .ics import (
    sample_ic_coeffs,
    lower_ic_at_points,
    channel_ic_at_points,
    sample_stream_ic_modes,
    stream_ic_at_points,
    lower_ic_on_grid,
    channel_ic_on_grid,
)

__all__ = [
    "sample_sincos_coeffs",
    "sincos_on_grid",
    "sincos_at_points",
    "input_grid_points",
    "rbf_kernel",
    "grf_cholesky",
    "grf_factor",
    "sample_grf",
    "GridInterpolator",
    "sample_ic_coeffs",
    "lower_ic_at_points",
    "channel_ic_at_points",
    "sample_stream_ic_modes",
    "stream_ic_at_points",
    "lower_ic_on_grid",
    "channel_ic_on_grid",
]
