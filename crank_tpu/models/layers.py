"""Shared conv building blocks ([B, T, C] layout, TPU-friendly feature-last)."""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class Conv1d(nn.Module):
    """1-D convolution over time with optional weight normalization.

    ``causal=True`` left-pads by the full receptive extent (reference parity:
    PWG's use_causal_conv); otherwise symmetric 'same' padding is used.

    ``streaming=True`` (causal only) replaces the zero left-pad with a
    per-layer ring buffer in the mutable ``"cache"`` variable collection:
    each call consumes a chunk ``[B, T_chunk, C]``, prepends the buffered
    last ``(kernel_size-1)*dilation`` input frames, and updates the buffer —
    chunked inference is then bit-identical to one offline causal pass.
    The parameter tree is unchanged, so trained checkpoints load directly.
    """

    features: int
    kernel_size: int = 1
    dilation: int = 1
    use_bias: bool = True
    causal: bool = False
    weight_norm: bool = True
    streaming: bool = False
    dtype: Optional[jnp.dtype] = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        span = (self.kernel_size - 1) * self.dilation
        if self.causal and self.streaming:
            if span > 0:
                buf = self.variable(
                    "cache",
                    "buf",
                    lambda: jnp.zeros(
                        (x.shape[0], span, x.shape[-1]), x.dtype
                    ),
                )
                x = jnp.concatenate([buf.value.astype(x.dtype), x], axis=1)
                buf.value = x[:, x.shape[1] - span:]
            padding = "VALID"
        elif self.causal:
            padding = [(span, 0)]
        else:
            padding = [(span // 2, span - span // 2)]
        conv = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding=padding,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )
        if self.weight_norm:
            conv = nn.WeightNorm(conv, variable_filter={"kernel"})
        return conv(x)


class ResidualBlock(nn.Module):
    """WaveNet gated residual block (PWG ResidualBlock semantics).

    Gated tanh/sigmoid activation with optional 1x1 auxiliary conditioning,
    1x1 projections to residual and skip paths, sqrt(0.5)-scaled residual sum.
    Reference architecture: the ParallelWaveGANGenerator blocks instantiated at
    crank/net/module/vqvae2.py:236-273.
    """

    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    kernel_size: int = 3
    dilation: int = 1
    causal: bool = False
    dropout: float = 0.0
    weight_norm: bool = True
    streaming: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        c: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        residual = x
        if self.dropout > 0.0:
            x = nn.Dropout(rate=self.dropout)(x, deterministic=deterministic)
        x = Conv1d(
            self.gate_channels,
            self.kernel_size,
            dilation=self.dilation,
            causal=self.causal,
            weight_norm=self.weight_norm,
            streaming=self.streaming,
            dtype=self.dtype,
        )(x)
        xa, xb = jnp.split(x, 2, axis=-1)
        if c is not None:
            c = Conv1d(self.gate_channels, 1, use_bias=False,
                       weight_norm=self.weight_norm, dtype=self.dtype,
                       name="aux_conv")(c)
            ca, cb = jnp.split(c, 2, axis=-1)
            xa, xb = xa + ca, xb + cb
        x = jnp.tanh(xa) * nn.sigmoid(xb)
        skip = Conv1d(self.skip_channels, 1, weight_norm=self.weight_norm,
                      dtype=self.dtype, name="skip_conv")(x)
        out = Conv1d(self.residual_channels, 1, weight_norm=self.weight_norm,
                     dtype=self.dtype, name="out_conv")(x)
        out = (out + residual.astype(out.dtype)) * jnp.sqrt(0.5).astype(
            out.dtype
        )
        return out, skip
