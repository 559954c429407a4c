"""Vector quantizer with straight-through estimator and EMA codebook updates.

Functional re-design of the reference Quantizer (crank/net/module/vqvae2.py:
286-347), whose EMA update mutates the embedding in-place during forward.
Here the state is explicit:

* ``ema_flag=False``: the codebook is a trainable parameter (gradient flows
  through the continuous lookup; the trainer adds the "dict" loss).
* ``ema_flag=True``: the codebook lives in the mutable ``"ema"`` variable
  collection together with the cluster-size / cluster-sum accumulators and is
  overwritten with the EMA-normalized estimate on every training forward with
  ``use_ema=True`` (matching reference semantics including Laplace smoothing
  of the size vector and the smoothed-size division).

Under a data-parallel ``jit`` over a Mesh the batch-reduction sums below are
*global* sums — XLA inserts the cross-replica collectives, which implements
the psum of cluster statistics called for in SURVEY.md §5.
"""

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class Quantizer(nn.Module):
    emb_dim: int
    emb_size: int
    decay: float = 0.99
    eps: float = 1e-5
    ema_flag: bool = False

    def setup(self):
        def cb_init(key):
            return jax.random.uniform(
                key, (self.emb_size, self.emb_dim),
                minval=-1.0 / self.emb_size, maxval=1.0 / self.emb_size,
            )

        if self.ema_flag:
            # codebook is non-differentiable state, updated by EMA.
            # (init keys are only consumed at init time; a dummy key is passed
            # on later applies where the variables already exist)
            key = (
                self.make_rng("params")
                if self.has_rng("params")
                else jax.random.PRNGKey(0)
            )
            k1, k2 = jax.random.split(key)
            self.codebook = self.variable("ema", "codebook", cb_init, k1)
            self.ema_size = self.variable(
                "ema", "ema_size", lambda: jnp.zeros((self.emb_size,))
            )
            self.ema_w = self.variable(
                "ema",
                "ema_w",
                lambda k: jax.random.normal(k, (self.emb_dim, self.emb_size)),
                k2,
            )
        else:
            self.codebook_param = self.param("codebook", cb_init)

    def _get_codebook(self) -> jnp.ndarray:
        return self.codebook.value if self.ema_flag else self.codebook_param

    def __call__(
        self, x: jnp.ndarray, train: bool = False, use_ema: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """x: [B, T, D] -> (embed_idx [B,T,D], quantized_st [B,T,D], idx [B,T]).

        ``embed_idx`` is the continuous codebook lookup (differentiable w.r.t.
        the codebook in non-EMA mode), ``quantized_st`` carries the
        straight-through gradient to the encoder.
        """
        cb = self._get_codebook()
        flat = x.reshape(-1, self.emb_dim)
        # nearest neighbor: ||x||^2 is constant per row, so argmin over
        # ||cb||^2 - 2 x.cb equals the full distance argmin; the [N,K]
        # score matrix and the one-hot projections are MXU matmuls —
        # measured 4-5x faster on TPU than a gather/scatter formulation.
        # (A fused Pallas variant was built and benchmarked in rounds 1-2;
        # XLA's own fusion never materializes the [N,K] scores in HBM and
        # beat the hand kernel ~2x at production geometry (22-25us vs
        # 44us/call, N=25k D=64 K=512, TPU v5e), so it was removed.)
        scores = jnp.sum(cb**2, axis=1)[None, :] - 2.0 * flat @ cb.T
        idx = jnp.argmin(scores, axis=1).reshape(x.shape[:2])
        onehot = jax.nn.one_hot(idx, self.emb_size, dtype=x.dtype)
        embed_idx = onehot @ cb
        counts = jnp.sum(onehot.reshape(-1, self.emb_size), axis=0)
        embed_sum = jnp.einsum("btd,btk->dk", x, onehot)

        if train and self.ema_flag and use_ema:
            ema_size = self.decay * self.ema_size.value + (1 - self.decay) * counts
            ema_w = self.decay * self.ema_w.value + (1 - self.decay) * embed_sum
            n = jnp.sum(ema_size)
            ema_size = (ema_size + self.eps) / (n + self.emb_size * self.eps) * n
            self.ema_size.value = ema_size
            self.ema_w.value = ema_w
            self.codebook.value = (ema_w / ema_size[None, :]).T

        quantized_st = x + jax.lax.stop_gradient(embed_idx - x)
        return embed_idx, quantized_st, idx
