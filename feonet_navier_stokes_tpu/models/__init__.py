"""Neural coefficient predictors (flax.linen, NHWC, bf16-capable).

Same i/o contracts as the reference model zoo (SURVEY.md C15-C18), minus the
reference's vestigial (B, 1, ng) middle dim: steady models map an input
featurization to (B, ng) mixed-FE coefficients; temporal models map an
initial condition to (B, T, ng) coefficient trajectories.
"""

from .steady import (
    Net2D,
    NetA,
    Net3D,
    FCNN,
    UNetFeatureExtractor,
    UNetWithHead,
    LinearMap,
)
from .temporal import (
    UNet2DTemporalRepeat,
    UNetTemporal,
    UNet1D,
    CoeffRNN,
    LinearStep,
    LinearStepRNN,
)
from .registry import build_model, MODEL_REGISTRY

__all__ = [
    "Net2D",
    "NetA",
    "Net3D",
    "FCNN",
    "UNetFeatureExtractor",
    "UNetWithHead",
    "LinearMap",
    "UNet2DTemporalRepeat",
    "UNetTemporal",
    "UNet1D",
    "CoeffRNN",
    "LinearStep",
    "LinearStepRNN",
    "build_model",
    "MODEL_REGISTRY",
]
