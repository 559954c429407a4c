"""Non-causal/causal WaveNet backbone — the encoder/decoder workhorse.

Equivalent in capability to the ParallelWaveGANGenerator the reference uses as
every VQ stack's encoder and decoder (crank/net/module/vqvae2.py:236-273,
SURVEY.md §2.3): dilated gated residual conv stack with skip connections,
1x1-conv auxiliary conditioning, and an exposed receptive-field size.
Frame-rate features only (no upsampling — the reference disables it too).
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from crank_tpu.models.layers import Conv1d, ResidualBlock


def dilations_for(layers: int, stacks: int) -> Sequence[int]:
    layers_per_stack = layers // stacks
    return [2 ** (i % layers_per_stack) for i in range(layers)]


def receptive_field_size(layers: int, stacks: int, kernel_size: int) -> int:
    return (kernel_size - 1) * sum(dilations_for(layers, stacks)) + 1


class WaveNetBackbone(nn.Module):
    out_channels: int
    kernel_size: int = 3
    layers: int = 6
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    causal: bool = False
    dropout: float = 0.0
    weight_norm: bool = True
    streaming: bool = False  # chunked causal inference with conv-state cache
    dtype: Optional[jnp.dtype] = None  # bf16 compute on the MXU when set

    @property
    def receptive_field(self) -> int:
        return receptive_field_size(self.layers, self.stacks, self.kernel_size)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        c: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """x: [B, T, in_ch]; c: optional [B, T, aux_ch]; returns [B, T, out]
        (always float32 out; intermediate compute in self.dtype)."""
        if self.dtype is not None:
            x = x.astype(self.dtype)
            c = c.astype(self.dtype) if c is not None else None
        x = Conv1d(self.residual_channels, 1, weight_norm=self.weight_norm,
                   dtype=self.dtype, name="first_conv")(x)
        skips = 0.0
        for i, d in enumerate(dilations_for(self.layers, self.stacks)):
            x, skip = ResidualBlock(
                residual_channels=self.residual_channels,
                gate_channels=self.gate_channels,
                skip_channels=self.skip_channels,
                kernel_size=self.kernel_size,
                dilation=d,
                causal=self.causal,
                dropout=self.dropout,
                weight_norm=self.weight_norm,
                streaming=self.streaming,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, c, deterministic=deterministic)
            skips = skips + skip
        skips = skips * jnp.sqrt(1.0 / self.layers).astype(skips.dtype)
        y = nn.relu(skips)
        y = Conv1d(self.skip_channels, 1, weight_norm=self.weight_norm,
                   dtype=self.dtype, name="post_conv1")(y)
        y = nn.relu(y)
        y = Conv1d(self.out_channels, 1, weight_norm=self.weight_norm,
                   dtype=self.dtype, name="post_conv2")(y)
        return y.astype(jnp.float32)
