"""Temporal models for the time-dependent Stokes rollout.

Parity targets (FEONet_time_dep_Stokes/network.py):
  * UNet2DTemporalRepeat  :37-130  U-Net latent -> global avg-pool -> Dense ->
                                   repeat T -> per-step Dense (the "UNet2D"
                                   trainer option)
  * UNetTemporal          :150-198 U-Net latent -> GRU/LSTM over T steps
  * UNet1D                :216-327 1D U-Net over the DoF axis, input
                                   [u0; xy-coords]; the reference constructs
                                   an nn.Linear INSIDE forward (network.py:306
                                   — untrained params every call, SURVEY.md
                                   "warts"); here the hidden->seq_len
                                   projection is a real parameter.
  * CoeffRNN              :342-398 u0 -> tanh(Dense) initial hidden state,
                                   autoregressive GRU/LSTM emitting T
                                   coefficient vectors (the "RNN" option).

All run the time axis under ``lax.scan`` (via flax nn.RNN / nn.scan) — the
reference's Python-loop autoregression (network.py:392-398) is a trace-time
unroll we avoid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from .init import conv_inits, dense_inits
from .steady import UNetFeatureExtractor, DoubleConv

Array = jnp.ndarray


def _cell(rnn_type: str, hidden: int):
    if rnn_type.lower() == "gru":
        return nn.GRUCell(features=hidden)
    if rnn_type.lower() == "lstm":
        return nn.OptimizedLSTMCell(features=hidden)
    raise ValueError(f"rnn_type must be 'gru' or 'lstm', got {rnn_type!r}")


class UNet2DTemporalRepeat(nn.Module):
    """U-Net on the IC grid; head repeats the pooled latent across T and
    applies a shared per-step projection (reference UNetWithHead in the
    time-dep network.py:88-130)."""

    d_out: int
    seq_len: int
    base_ch: int = 32
    latent_ch: int = 16
    hidden: int = 128
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        latent = UNetFeatureExtractor(self.base_ch, self.latent_ch, self.compute_dtype)(
            x, train
        )  # (B, H, W, d)
        g = latent.mean(axis=(1, 2)).astype(jnp.float32)  # AdaptiveAvgPool2d(1)
        h = nn.silu(nn.Dense(self.hidden, **dense_inits(g))(g))
        h = jnp.repeat(h[:, None, :], self.seq_len, axis=1)  # (B, T, hidden)
        return nn.Dense(self.d_out, **dense_inits(h))(h)


class UNetTemporal(nn.Module):
    """U-Net latent -> GRU/LSTM head over T (reference UNetWithTemporalHead,
    network.py:150-198: pooled latent -> tanh(Dense) -> repeated as the RNN
    *input* sequence, zero initial state)."""

    d_out: int
    seq_len: int
    base_ch: int = 32
    latent_ch: int = 16
    hidden: int = 128
    rnn_type: str = "gru"
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        latent = UNetFeatureExtractor(self.base_ch, self.latent_ch, self.compute_dtype)(
            x, train
        )
        g = latent.mean(axis=(1, 2)).astype(jnp.float32)
        h = jnp.tanh(nn.Dense(self.hidden, **dense_inits(g))(g))
        seq_in = jnp.repeat(h[:, None, :], self.seq_len, axis=1)
        out = nn.RNN(_cell(self.rnn_type, self.hidden))(seq_in)  # (B, T, hidden)
        return nn.Dense(self.d_out, **dense_inits(out))(out)


class ConvBNAct1D(nn.Module):
    features: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        x = nn.Conv(self.features, (3,), padding="SAME", dtype=self.compute_dtype,
                    **conv_inits(x, (3,)))(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        return nn.silu(x)


class DoubleConv1D(nn.Module):
    features: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        x = ConvBNAct1D(self.features, self.compute_dtype)(x, train)
        return ConvBNAct1D(self.features, self.compute_dtype)(x, train)


def _interp_linear(x: Array, size: int) -> Array:
    """Length-axis linear resize for (B, N, C) — torch F.interpolate(mode=
    'linear', align_corners=False) equivalent."""
    return jax.image.resize(x, (x.shape[0], size, x.shape[2]), method="linear")


class UNet1D(nn.Module):
    """1D U-Net over the DoF axis; input (B, N, C) with C=[u0, x, y]
    channels; output (B, seq_len, N) (reference UNetWithHead1D,
    network.py:216-327)."""

    seq_len: int
    base_ch: int = 32
    latent_ch: int = 16
    hidden: int = 128
    head_kernel: int = 7
    head_blocks: int = 1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cd = self.compute_dtype
        x = x.astype(cd)
        e1 = DoubleConv1D(self.base_ch, cd)(x, train)
        p1 = nn.max_pool(e1, (2,), (2,), padding=((0, e1.shape[1] % 2),))
        e2 = DoubleConv1D(self.base_ch * 2, cd)(p1, train)
        p2 = nn.max_pool(e2, (2,), (2,), padding=((0, e2.shape[1] % 2),))
        b = DoubleConv1D(self.base_ch * 4, cd)(p2, train)

        d2 = _interp_linear(b, e2.shape[1])
        d2 = DoubleConv1D(self.base_ch * 2, cd)(jnp.concatenate([d2, e2], -1), train)
        d1 = _interp_linear(d2, e1.shape[1])
        d1 = DoubleConv1D(self.base_ch, cd)(jnp.concatenate([d1, e1], -1), train)
        latent = nn.Conv(self.latent_ch, (1,), dtype=cd, **conv_inits(d1, (1,)))(d1)  # (B, N, latent)

        # head: conv stack then a REAL hidden->seq_len parameter (fixes the
        # reference's Linear-inside-forward bug, network.py:306).
        k1 = (self.head_kernel,)
        h = nn.silu(nn.Conv(self.hidden, k1, padding="SAME", dtype=cd,
                            **conv_inits(latent, k1))(latent))
        for _ in range(self.head_blocks):
            h = nn.silu(nn.Conv(self.hidden, k1, padding="SAME", dtype=cd,
                                **conv_inits(h, k1))(h))
        h = nn.Conv(self.hidden, k1, padding="SAME", dtype=cd, **conv_inits(h, k1))(h)
        h = h.astype(jnp.float32)
        out = nn.Dense(self.seq_len, **dense_inits(h))(h)  # (B, N, T)
        return jnp.swapaxes(out, 1, 2)  # (B, T, N)


def _identity_init(key, shape, dtype=jnp.float32):
    del key
    return jnp.eye(shape[0], shape[1], dtype=dtype)


class _AffineStep(nn.Module):
    """One shared affine step: h_t = W h_{t-1} + b, emitted as-is."""

    d_out: int

    @nn.compact
    def __call__(self, carry, _):
        h = nn.Dense(
            self.d_out,
            kernel_init=_identity_init,
            bias_init=nn.initializers.zeros,
        )(carry)
        return h, h


class LinearStep(nn.Module):
    """Learned affine one-step propagator rolled out under ``nn.scan``.

    The time-dependent Stokes problem is LINEAR: the implicit-Euler update is
    u_t = P u_{t-1} + c with a constant P = (S+dt·A)^{-1}S and
    c = (S+dt·A)^{-1}·dt·f (reference create_data.py:75-91 does exactly this
    rollout with the true matrices). The solution operator the other temporal
    models approximate with RNNs/U-Nets is therefore an affine recursion —
    this model IS that class of functions: an affine input map u0 -> h0
    followed by T applications of one shared affine step. The label-free
    rollout residual drives (W, b) toward the exact discrete propagator, so
    accuracy is limited by optimization, not capacity. Both maps initialize
    at identity/zero: for small dt the true P is near identity, and identity
    keeps the T-step product well-conditioned at init.
    """

    d_out: int
    seq_len: int

    @nn.compact
    def __call__(self, u0: Array, train: bool = False) -> Array:
        u0 = u0.astype(jnp.float32)
        ident = u0.shape[-1] == self.d_out
        h0 = nn.Dense(
            self.d_out,
            kernel_init=_identity_init if ident else dense_inits(u0)["kernel_init"],
            bias_init=nn.initializers.zeros,
        )(u0)
        Step = nn.scan(
            _AffineStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            length=self.seq_len,
            out_axes=1,
        )
        _, ys = Step(self.d_out)(h0, None)
        return ys  # (B, T, d_out)


class LinearStepRNN(nn.Module):
    """LinearStep propagator + zero-gated autoregressive RNN correction.

    Trained end-to-end by the label-free rollout residual (no closed-form
    parameters injected). The affine branch gives the optimizer a quadratic
    bowl whose minimum is the exact discrete propagator of the LINEAR
    timedep-Stokes step (see LinearStep docstring); a pure RNN instead has
    to bend a nonlinear recursion onto that affine map and floors on the
    weakly-weighted pressure directions (round-2 best: traj 3.6e-3 with
    p 0.023). The RNN branch is gated by a scalar ``alpha`` initialized to
    ZERO (ReZero-style): at init the model IS a trainable LinearStep, and
    alpha only moves once a nonzero correction lowers the loss — which also
    makes this the right model class for the time-dependent NS step, where
    the true one-step map is affine + a quadratic convection correction.

    No reference counterpart (its temporal models are the four pure nets,
    FEONet_time_dep_Stokes/network.py:37-398); TPU-first addition.
    """

    d_out: int
    seq_len: int
    hidden: int = 512
    rnn_type: str = "gru"

    @nn.compact
    def __call__(self, u0: Array, train: bool = False) -> Array:
        lin = LinearStep(d_out=self.d_out, seq_len=self.seq_len)(u0)
        corr = CoeffRNN(
            d_out=self.d_out,
            seq_len=self.seq_len,
            hidden=self.hidden,
            rnn_type=self.rnn_type,
        )(u0)
        alpha = self.param("alpha", nn.initializers.zeros, (1,))
        return lin + alpha * corr


class _ARStep(nn.Module):
    """One autoregressive step: (rnn_carry, prev_vec) -> emit next vec."""

    hidden: int
    d_out: int
    rnn_type: str

    @nn.compact
    def __call__(self, carry, _):
        rnn_carry, prev_vec = carry
        new_carry, h = _cell(self.rnn_type, self.hidden)(rnn_carry, prev_vec)
        vec = nn.Dense(self.d_out, **dense_inits(h))(h)
        return (new_carry, vec), vec


class CoeffRNN(nn.Module):
    """Autoregressive coefficient RNN (reference VectorToSequenceRNN,
    network.py:342-398): h0 = tanh(Dense(u0)), start token 0, each step feeds
    the previous emitted coefficient vector back in — here a single
    ``nn.scan`` instead of the reference's Python loop."""

    d_out: int
    seq_len: int
    hidden: int = 512
    rnn_type: str = "gru"

    @nn.compact
    def __call__(self, u0: Array, train: bool = False) -> Array:
        B = u0.shape[0]
        u0 = u0.astype(jnp.float32)
        h0 = jnp.tanh(nn.Dense(self.hidden, **dense_inits(u0))(u0))
        if self.rnn_type.lower() == "lstm":
            carry0 = (jnp.zeros_like(h0), h0)  # flax LSTM carry = (c, h)
        else:
            carry0 = h0
        AR = nn.scan(
            _ARStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            length=self.seq_len,
            out_axes=1,
        )
        start = jnp.zeros((B, self.d_out), dtype=jnp.float32)
        _, ys = AR(self.hidden, self.d_out, self.rnn_type)((carry0, start), None)
        return ys
