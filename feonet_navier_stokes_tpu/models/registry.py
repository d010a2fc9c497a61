"""Model registry: one factory replacing the per-script if/elif ladders
(reference: FEONet_Stokes_square/train_FEONet.py:153-167,
FEONet_time_dep_Stokes/train_FEONet.py:200-227)."""

from __future__ import annotations

from typing import Any

from .steady import Net2D, NetA, Net3D, FCNN, UNetWithHead, LinearMap
from .temporal import (
    UNet2DTemporalRepeat,
    UNetTemporal,
    UNet1D,
    CoeffRNN,
    LinearStep,
    LinearStepRNN,
)

MODEL_REGISTRY: dict[str, Any] = {
    # steady (input: (B, R, R, 2) forcing grid; FCNN takes (B, 6) coeffs)
    "Net2D": Net2D,
    "NetA": NetA,
    "Net3D": Net3D,
    "FCNN": FCNN,
    "UNetWithHead": UNetWithHead,
    # TPU-first addition: convex affine model for the linear steady problems
    # (models/steady.py LinearMap docstring).
    "LinearMap": LinearMap,
    # temporal (input: IC grid (B, R, R, 2); UNet1D (B, N, 3); RNN (B, ng))
    "UNet2D": UNet2DTemporalRepeat,
    "UNetTemporal": UNetTemporal,
    "UNet1D": UNet1D,
    "RNN": CoeffRNN,
    # TPU-first addition (no reference counterpart): the timedep problem is
    # linear, so its solution operator is an affine recursion — learn it
    # directly (models/temporal.py LinearStep docstring).
    "LinearStep": LinearStep,
    # TPU-first addition: LinearStep + zero-gated RNN correction trained
    # end-to-end (models/temporal.py LinearStepRNN docstring).
    "LinearStepRNN": LinearStepRNN,
}


def build_model(name: str, d_out: int, **kwargs):
    """Instantiate a model by reference-compatible name."""
    if name not in MODEL_REGISTRY:
        raise ValueError(f"unknown model {name!r}; have {sorted(MODEL_REGISTRY)}")
    cls = MODEL_REGISTRY[name]
    if name == "UNet1D":
        kwargs.pop("d_out", None)
        return cls(**kwargs)
    return cls(d_out=d_out, **kwargs)
