"""TPU-native neural vocoder (Parallel-WaveGAN-style).

The reference delegates neural vocoding to the external parallel_wavegan
package (stage 6, egs/vaevc/template/run.sh:193-236, SURVEY.md §2.3).  This
is a first-party equivalent trained on this framework's own feature pipeline:
a non-autoregressive WaveNet conditioned on upsampled log-mel features with a
noise input, trained with multi-resolution STFT + LSGAN adversarial losses.
[B, T, C] layout; generation of a full utterance is one jitted forward.
"""

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from crank_tpu.models.layers import Conv1d, ResidualBlock
from crank_tpu.models.wavenet import dilations_for


class MelUpsampler(nn.Module):
    """Frame-rate conditioning -> sample-rate via ConvTranspose stack.

    prod(strides) must equal hop_size.
    """

    channels: int = 80
    strides: Tuple[int, ...] = (8, 4, 4)

    @nn.compact
    def __call__(self, c: jnp.ndarray) -> jnp.ndarray:
        for s in self.strides:
            c = nn.ConvTranspose(
                features=self.channels,
                kernel_size=(2 * s,),
                strides=(s,),
                padding="SAME",
            )(c)
            c = nn.leaky_relu(c, 0.2)
        return c


class PWGVocoder(nn.Module):
    """Noise + upsampled-mel -> waveform WaveNet."""

    layers: int = 30
    stacks: int = 3
    kernel_size: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    upsample_strides: Tuple[int, ...] = (8, 4, 4)

    @property
    def hop_size(self) -> int:
        out = 1
        for s in self.upsample_strides:
            out *= s
        return out

    @nn.compact
    def __call__(self, z: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        """z: noise [B, L]; c: log-mel [B, T, aux]; L == T * hop.

        Returns waveform [B, L].
        """
        cu = MelUpsampler(self.aux_channels, self.upsample_strides)(c)
        x = Conv1d(self.residual_channels, 1, name="first_conv")(z[..., None])
        skips = 0.0
        for i, d in enumerate(dilations_for(self.layers, self.stacks)):
            x, skip = ResidualBlock(
                residual_channels=self.residual_channels,
                gate_channels=self.gate_channels,
                skip_channels=self.skip_channels,
                kernel_size=self.kernel_size,
                dilation=d,
                name=f"block_{i}",
            )(x, cu)
            skips = skips + skip
        skips = skips * jnp.sqrt(1.0 / self.layers).astype(skips.dtype)
        y = nn.relu(skips)
        y = Conv1d(self.skip_channels, 1, name="post_conv1")(y)
        y = nn.relu(y)
        y = Conv1d(1, 1, name="post_conv2")(y)
        return jnp.tanh(y[..., 0])
