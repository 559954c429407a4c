"""Speaker-adversarial network with gradient reversal.

Reference: crank/net/module/spkradv.py — identity forward, -scale * grad
backward (custom autograd), followed by a conv classifier over the
concatenated unmodified encoder outputs.  Here the GRL is a jax.custom_vjp.
"""

from functools import partial
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from crank_tpu.models.discriminator import ConvDiscriminator


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def gradient_reversal(x, scale: float = 1.0):
    return x


def _grl_fwd(x, scale):
    return x, None


def _grl_bwd(scale, _, g):
    return (jax.tree_util.tree_map(lambda t: -scale * t, g),)


gradient_reversal.defvjp(_grl_fwd, _grl_bwd)


class SpeakerAdversarialNetwork(nn.Module):
    spkr_size: int
    scale: float = 0.1  # conf["spkradv_lambda"]
    kernel_size: int = 3
    layers: int = 3

    @nn.compact
    def __call__(
        self, encoded: Sequence[jnp.ndarray], detach: bool = False
    ) -> jnp.ndarray:
        """encoded: per-stack encoder outputs [B, T, D_n] -> logits [B, T, S]."""
        x = jnp.concatenate(list(encoded), axis=-1)
        if detach:
            x = jax.lax.stop_gradient(x)
        x = gradient_reversal(x, self.scale)
        return ConvDiscriminator(
            out_channels=self.spkr_size,
            kernel_size=self.kernel_size,
            layers=self.layers,
            conv_channels=64,
            dilation_factor=1,
        )(x)
