"""Steady coefficient predictors: Net2D CNN, FCNN MLP, UNetWithHead.

Behavioral parity with the reference model zoo
(FEONet_Stokes_square/network.py — identical file in all three steady dirs):
  * Net2D      :54-84   conv(k,same) -> SiLU -> blocks x (conv+SiLU) -> conv
                         -> flatten -> Dense(ng)
  * FCNN       :120-138 MLP with Tanh + Dropout
  * UNetWithHead :143-268 2-level U-Net (DoubleConv = 2x[Conv-BN-SiLU],
                         MaxPool, ConvTranspose skips) -> 1x1 latent proj ->
                         Net2D-style head

TPU-first deltas from the torch code:
  * NHWC layout (XLA's native conv layout) instead of NCHW.
  * ``compute_dtype`` lets the conv/matmul path run in bfloat16 on the MXU
    while params and the final coefficient head stay float32.
  * Output is (B, ng) — the reference's (B, 1, ng) unsqueeze is dropped.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from .init import conv_inits, conv_transpose_inits, dense_inits

Array = jnp.ndarray


class Net2D(nn.Module):
    """Plain conv stack + linear head (reference Net2D, network.py:54-84).

    ``pool`` (TPU-first addition, no reference counterpart): number of 2x2
    max-pools applied after the conv activations. At large d_out the head's
    Dense kernel is flatten_dim x d_out — at resol 50 / filters 32 that is
    80_000 x d_out, which at d_out ~ 45k (the 38k-DoF hole problem's BPX
    w-dimension) is a 14 GB fp32 tensor that cannot fit one chip's HBM.
    Each pool shrinks the flatten (and the head kernel) by ~4x while keeping
    the conv capacity untouched.

    ``head_rank`` (TPU-first addition): >0 factors the Dense head into
    Dense(head_rank) @ Dense(d_out) with no nonlinearity between — an exact
    low-rank parameterization of the same affine family. At the 47k-DoF
    stretch config the monolithic head is ~150M params and the train step is
    ~55% optimizer HBM traffic (docs/performance.md §BSR); rank r cuts head
    params (and their Adam/adafactor traffic AND all three matmul passes)
    by ~flatten*d_out / (r*(flatten+d_out)).

    ``head_dtype`` (TPU-first addition): bfloat16 runs the head matmuls
    (fwd + both grad transposes) with bf16 operands on the MXU at 2x the
    f32 rate and HALF the kernel's HBM read traffic per pass — params stay
    float32 (flax param_dtype), so the optimizer and checkpoints are exact;
    MXU accumulation is f32. The UNCHANGED-model speed lever for the
    HBM-bound 47k head (docs/performance.md §BSR)."""

    d_out: int
    filters: int = 32
    kernel_size: int = 5
    blocks: int = 0
    pool: int = 0
    head_rank: int = 0
    compute_dtype: jnp.dtype = jnp.float32
    head_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        k = (self.kernel_size, self.kernel_size)
        x = x.astype(self.compute_dtype)
        x = nn.silu(nn.Conv(self.filters, k, padding="SAME", dtype=self.compute_dtype,
                            **conv_inits(x, k))(x))
        for _ in range(self.blocks):
            x = nn.silu(nn.Conv(self.filters, k, padding="SAME", dtype=self.compute_dtype,
                                **conv_inits(x, k))(x))
        x = nn.Conv(self.filters, k, padding="SAME", dtype=self.compute_dtype,
                    **conv_inits(x, k))(x)
        for _ in range(self.pool):
            x = nn.max_pool(x, (2, 2), (2, 2))
        hd = self.head_dtype
        x = x.reshape(x.shape[0], -1).astype(hd)
        if self.head_rank > 0:
            x = nn.Dense(self.head_rank, dtype=hd, **dense_inits(x))(x)
        return nn.Dense(self.d_out, dtype=hd,
                        **dense_inits(x))(x).astype(jnp.float32)


class NetA(nn.Module):
    """1D conv sibling of Net2D (reference NetA, network.py:20-50) — operates
    on (B, N, C) sequences (e.g. forcing sampled along a 1D coordinate)."""

    d_out: int
    filters: int = 32
    kernel_size: int = 7
    blocks: int = 0
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        k = (self.kernel_size,)
        x = x.astype(self.compute_dtype)
        x = nn.silu(nn.Conv(self.filters, k, padding="SAME", dtype=self.compute_dtype,
                            **conv_inits(x, k))(x))
        for _ in range(self.blocks):
            x = nn.silu(nn.Conv(self.filters, k, padding="SAME", dtype=self.compute_dtype,
                                **conv_inits(x, k))(x))
        x = nn.Conv(self.filters, k, padding="SAME", dtype=self.compute_dtype,
                    **conv_inits(x, k))(x)
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        return nn.Dense(self.d_out, dtype=jnp.float32, **dense_inits(x))(x)


class Net3D(nn.Module):
    """3D conv sibling of Net2D (reference Net3D, network.py:88-118) —
    operates on (B, D, H, W, C) volumes."""

    d_out: int
    filters: int = 32
    kernel_size: int = 5
    blocks: int = 0
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        k = (self.kernel_size,) * 3
        x = x.astype(self.compute_dtype)
        x = nn.silu(nn.Conv(self.filters, k, padding="SAME", dtype=self.compute_dtype,
                            **conv_inits(x, k))(x))
        for _ in range(self.blocks):
            x = nn.silu(nn.Conv(self.filters, k, padding="SAME", dtype=self.compute_dtype,
                                **conv_inits(x, k))(x))
        x = nn.Conv(self.filters, k, padding="SAME", dtype=self.compute_dtype,
                    **conv_inits(x, k))(x)
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        return nn.Dense(self.d_out, dtype=jnp.float32, **dense_inits(x))(x)


class LinearMap(nn.Module):
    """Single affine map flatten(input) -> coefficients.

    TPU-first addition (no reference counterpart): for the LINEAR steady
    problems (Stokes square / hole) the forcing -> coefficient solution
    operator is itself linear, and for band-limited forcing families
    (sincos with bounded frequency, GRF with l=2) the R x R grid sampling
    resolves the field, so an affine map from the grid values to the
    coefficients can represent the operator to quadrature accuracy. Under
    the preconditioned residual objective the loss is then a convex
    quadratic in the parameters — optimization converges to the global
    optimum instead of a CNN's local one.
    """

    d_out: int

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        return nn.Dense(self.d_out, dtype=jnp.float32, **dense_inits(x))(x)


class FCNN(nn.Module):
    """MLP on the 6 forcing parameters (reference FCNN, network.py:120-138).

    Trainer instantiates hidden_dims=[16,32,64,128,256]
    (FEONet_Stokes_square/train_FEONet.py:157).
    """

    d_out: int
    hidden_dims: Sequence[int] = (16, 32, 64, 128, 256)
    dropout: float = 0.2
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = x.astype(self.compute_dtype)
        for h in self.hidden_dims:
            x = jnp.tanh(nn.Dense(h, dtype=self.compute_dtype, **dense_inits(x))(x))
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = x.astype(jnp.float32)
        return nn.Dense(self.d_out, dtype=jnp.float32, **dense_inits(x))(x)


class ConvBNAct(nn.Module):
    features: int
    kernel: int = 3
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), padding="SAME",
            dtype=self.compute_dtype,
            **conv_inits(x, (self.kernel, self.kernel)),
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        return nn.silu(x)


class DoubleConv(nn.Module):
    features: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        x = ConvBNAct(self.features, compute_dtype=self.compute_dtype)(x, train)
        return ConvBNAct(self.features, compute_dtype=self.compute_dtype)(x, train)


class UNetFeatureExtractor(nn.Module):
    """2-level U-Net, spatial-size preserving (network.py:165-211)."""

    base_ch: int = 32
    latent_ch: int = 64
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cd = self.compute_dtype
        x = x.astype(cd)
        e1 = DoubleConv(self.base_ch, cd)(x, train)
        e2 = DoubleConv(self.base_ch * 2, cd)(nn.max_pool(e1, (2, 2), (2, 2)), train)
        b = DoubleConv(self.base_ch * 4, cd)(nn.max_pool(e2, (2, 2), (2, 2)), train)

        d2 = nn.ConvTranspose(self.base_ch * 2, (2, 2), (2, 2), dtype=cd,
                              **conv_transpose_inits(self.base_ch * 2, (2, 2)))(b)
        d2 = DoubleConv(self.base_ch * 2, cd)(jnp.concatenate([d2, e2], -1), train)
        d1 = nn.ConvTranspose(self.base_ch, (2, 2), (2, 2), dtype=cd,
                              **conv_transpose_inits(self.base_ch, (2, 2)))(d2)
        d1 = DoubleConv(self.base_ch, cd)(jnp.concatenate([d1, e1], -1), train)
        return nn.Conv(self.latent_ch, (1, 1), dtype=cd, **conv_inits(d1, (1, 1)))(d1)


class UNetHead(nn.Module):
    """Net2D-style conv head on the latent (network.py:216-240).

    ``head_rank`` factors the final Dense as in :class:`Net2D` — at 47k DoF
    the monolithic flatten x d_out kernel is ~300M params. ``head_dtype``
    = bfloat16 runs the head matmuls with bf16 operands / f32 params, as in
    :class:`Net2D`."""

    d_out: int
    filters: int = 64
    kernel_size: int = 7
    blocks: int = 1
    head_rank: int = 0
    compute_dtype: jnp.dtype = jnp.float32
    head_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = (self.kernel_size, self.kernel_size)
        cd = self.compute_dtype
        x = nn.silu(nn.Conv(self.filters, k, padding="SAME", dtype=cd,
                            **conv_inits(x, k))(x))
        for _ in range(self.blocks):
            x = nn.silu(nn.Conv(self.filters, k, padding="SAME", dtype=cd,
                                **conv_inits(x, k))(x))
        x = nn.Conv(self.filters, k, padding="SAME", dtype=cd, **conv_inits(x, k))(x)
        hd = self.head_dtype
        x = x.reshape(x.shape[0], -1).astype(hd)
        if self.head_rank > 0:
            x = nn.Dense(self.head_rank, dtype=hd, **dense_inits(x))(x)
        return nn.Dense(self.d_out, dtype=hd,
                        **dense_inits(x))(x).astype(jnp.float32)


class UNetWithHead(nn.Module):
    """The reference's best steady model (network.py:246-268); trainer config
    base_ch=32, latent_ch=64, head_filters=FILTERS, head_blocks=BLOCKS
    (train_FEONet.py:159-167)."""

    d_out: int
    base_ch: int = 32
    latent_ch: int = 64
    head_filters: int = 64
    head_kernel_size: int = 7
    head_blocks: int = 1
    head_rank: int = 0
    compute_dtype: jnp.dtype = jnp.float32
    head_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        latent = UNetFeatureExtractor(
            self.base_ch, self.latent_ch, self.compute_dtype
        )(x, train)
        return UNetHead(
            self.d_out,
            self.head_filters,
            self.head_kernel_size,
            self.head_blocks,
            self.head_rank,
            self.compute_dtype,
            self.head_dtype,
        )(latent)
