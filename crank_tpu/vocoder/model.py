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


class CausalMelUpsampler(nn.Module):
    """Causal frame-rate -> sample-rate upsampler (streaming vocoder).

    The ConvTranspose upsampler above is acausal (SAME padding centers the
    kernel, so sample n sees conditioning frames past n/hop).  Here each
    stage is nearest-neighbor repeat xS followed by a *causal* smoothing
    conv of the same kernel extent (2S), so sample n depends only on frames
    <= n/hop — chunk-synchronous inference then reproduces the offline
    forward exactly via the Conv1d ring-buffer caches (models/layers.py).
    """

    channels: int = 80
    strides: Tuple[int, ...] = (8, 4, 4)
    streaming: bool = False

    @nn.compact
    def __call__(self, c: jnp.ndarray) -> jnp.ndarray:
        for s in self.strides:
            c = jnp.repeat(c, s, axis=1)
            c = Conv1d(
                self.channels,
                kernel_size=2 * s,
                causal=True,
                streaming=self.streaming,
            )(c)
            c = nn.leaky_relu(c, 0.2)
        return c


class PWGVocoder(nn.Module):
    """Noise + upsampled-mel -> waveform WaveNet.

    ``causal=True`` makes every conv (upsampler included) strictly causal,
    enabling chunk-synchronous streaming synthesis: with ``streaming=True``
    each conv carries its left context in the ``"cache"`` variable
    collection, so per-chunk calls are bit-identical to one offline causal
    pass (same mechanism as the causal VQVAE2, models/layers.py Conv1d).
    The parameter tree is unchanged between streaming and offline modes, so
    a trained causal checkpoint serves both.
    """

    layers: int = 30
    stacks: int = 3
    kernel_size: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    upsample_strides: Tuple[int, ...] = (8, 4, 4)
    causal: bool = False
    streaming: bool = False

    @property
    def hop_size(self) -> int:
        out = 1
        for s in self.upsample_strides:
            out *= s
        return out

    @property
    def receptive_field(self) -> int:
        """Receptive extent in samples of the WaveNet stack (excl. the
        upsampler's frame-rate context)."""
        span = sum(
            (self.kernel_size - 1) * d
            for d in dilations_for(self.layers, self.stacks)
        )
        return span + 1

    @nn.compact
    def __call__(self, z: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        """z: noise [B, L]; c: log-mel [B, T, aux]; L == T * hop.

        Returns waveform [B, L].
        """
        if self.causal:
            cu = CausalMelUpsampler(
                self.aux_channels, self.upsample_strides,
                streaming=self.streaming,
            )(c)
        else:
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
                causal=self.causal,
                streaming=self.streaming,
                name=f"block_{i}",
            )(x, cu)
            skips = skips + skip
        skips = skips * jnp.sqrt(1.0 / self.layers).astype(skips.dtype)
        y = nn.relu(skips)
        y = Conv1d(self.skip_channels, 1, name="post_conv1")(y)
        y = nn.relu(y)
        y = Conv1d(1, 1, name="post_conv2")(y)
        return jnp.tanh(y[..., 0])
