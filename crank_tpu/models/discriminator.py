"""Discriminator / classifier networks.

Capability-equivalent to the two parallel_wavegan discriminators the reference
imports (crank/bin/train.py:24-27, crank/net/module/spkradv.py:49-60):
a plain dilated-conv + LeakyReLU stack and a WaveNet-like residual variant
with dropout. [B, T, C] layout.
"""

import flax.linen as nn
import jax.numpy as jnp

from crank_tpu.models.layers import Conv1d, ResidualBlock


class ConvDiscriminator(nn.Module):
    """Stack of dilated 1-D convs + LeakyReLU (PWG discriminator equivalent)."""

    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 10
    conv_channels: int = 64
    dilation_factor: int = 1
    negative_slope: float = 0.2
    weight_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for i in range(self.layers - 1):
            if i == 0:
                dilation = 1
            else:
                dilation = i if self.dilation_factor == 1 else self.dilation_factor**i
            x = Conv1d(self.conv_channels, self.kernel_size, dilation=dilation,
                       weight_norm=self.weight_norm, name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, self.negative_slope)
        x = Conv1d(self.out_channels, self.kernel_size,
                   weight_norm=self.weight_norm, name="conv_out")(x)
        return x


class ResidualDiscriminator(nn.Module):
    """WaveNet-like residual discriminator (ResidualParallelWaveGANDiscriminator
    equivalent; used when conf['use_residual_network'] is true)."""

    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 8
    stacks: int = 4
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    dropout: float = 0.0
    weight_norm: bool = True
    # upstream ResidualParallelWaveGANDiscriminator default nonlinearity is
    # LeakyReLU(0.2) (round-3 parity fix; was relu)
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        layers_per_stack = self.layers // self.stacks
        x = Conv1d(self.residual_channels, 1, weight_norm=self.weight_norm,
                   name="first_conv")(x)
        x = nn.leaky_relu(x, self.negative_slope)
        skips = 0.0
        for i in range(self.layers):
            x, skip = ResidualBlock(
                residual_channels=self.residual_channels,
                gate_channels=self.gate_channels,
                skip_channels=self.skip_channels,
                kernel_size=self.kernel_size,
                dilation=2 ** (i % layers_per_stack),
                dropout=self.dropout,
                weight_norm=self.weight_norm,
                name=f"block_{i}",
            )(x, None, deterministic=deterministic)
            skips = skips + skip
        skips = skips * jnp.sqrt(1.0 / self.layers).astype(skips.dtype)
        y = nn.leaky_relu(skips, self.negative_slope)
        y = Conv1d(self.skip_channels, 1, weight_norm=self.weight_norm,
                   name="post_conv1")(y)
        y = nn.leaky_relu(y, self.negative_slope)
        y = Conv1d(self.out_channels, 1, weight_norm=self.weight_norm,
                   name="post_conv2")(y)
        return y
