"""Fused vector-quantization kernel (Pallas TPU).

The VQ codebook search is the framework's hottest non-conv op
(crank/net/module/vqvae2.py:338-347 in the reference): for N = batch*frames
vectors against K codes it builds an [N, K] score matrix, argmins it, and
projects one-hots back through the codebook — plus EMA cluster statistics.
Written naively that round-trips ~[N, K] float32 through HBM several times
per quantizer call.

This kernel tiles N, keeps the codebook and the per-tile score matrix in
VMEM, and emits in one pass:
  * idx        [N]      nearest code indices
  * quantized  [N, D]   codebook rows (via onehot @ codebook on the MXU)
  * counts     [G, K]   per-tile one-hot column sums   (sum over G outside)
  * embed_sum  [G, D, K] per-tile x^T @ onehot          (sum over G outside)

so HBM sees only the inputs and the (much smaller) outputs.  `vq_fused`
falls back to an identical pure-XLA formulation off-TPU (and under grad —
the kernel is used on the EMA path where no gradient flows through the
codebook lookup).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

TILE_N = 1024


def _kernel(x_ref, cb_ref, cbsq_ref, idx_ref, emb_ref, cnt_ref, esum_ref):
    from jax.experimental import pallas as pl

    x = x_ref[:]                        # [TM, D]
    cb = cb_ref[:]                      # [K, D]
    scores = cbsq_ref[:] - 2.0 * jax.lax.dot_general(
        x, cb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                   # [TM, K]
    idx = jnp.argmin(scores, axis=1).astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    onehot = (col == idx[:, None]).astype(jnp.float32)
    idx_ref[:] = idx
    emb_ref[:] = jax.lax.dot_general(
        onehot, cb,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    # statistics accumulate into fixed blocks revisited on every grid step
    @pl.when(pl.program_id(0) == 0)
    def _():
        cnt_ref[:] = jnp.zeros_like(cnt_ref)
        esum_ref[:] = jnp.zeros_like(esum_ref)

    cnt_ref[0, :] += jnp.sum(onehot, axis=0)
    esum_ref[:, :] += jax.lax.dot_general(
        x, onehot,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                   # [D, K]


@partial(jax.jit, static_argnames=("interpret",))
def _vq_fused_pallas(flat, cb, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = flat.shape
    k = cb.shape[0]
    n_pad = -(-n // TILE_N) * TILE_N
    x = jnp.pad(flat.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    cbsq = jnp.sum(cb.astype(jnp.float32) ** 2, axis=1)[None, :]  # [1, K]
    grid = n_pad // TILE_N

    idx, emb, cnt, esum = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE_N, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_N,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad,), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((8, k), jnp.float32),
            jax.ShapeDtypeStruct((d, k), jnp.float32),
        ],
        interpret=interpret,
    )(x, cb.astype(jnp.float32), cbsq)
    # padded rows all select some code; subtract their contribution from the
    # statistics (they are zero vectors -> they only pollute counts)
    if n_pad != n:
        pad_idx = idx[n:]
        pad_onehot = jax.nn.one_hot(pad_idx, k, dtype=jnp.float32)
        cnt_fix = jnp.sum(pad_onehot, axis=0)
    else:
        cnt_fix = jnp.zeros((k,), jnp.float32)
    counts = cnt[0] - cnt_fix
    embed_sum = esum  # zero-pad rows contribute zeros
    return idx[:n], emb[:n], counts, embed_sum


def _vq_fused_xla(flat, cb):
    scores = jnp.sum(cb**2, axis=1)[None, :] - 2.0 * flat @ cb.T
    idx = jnp.argmin(scores, axis=1)
    onehot = jax.nn.one_hot(idx, cb.shape[0], dtype=flat.dtype)
    emb = onehot @ cb
    counts = jnp.sum(onehot, axis=0)
    embed_sum = flat.T @ onehot
    return idx.astype(jnp.int32), emb, counts, embed_sum


def vq_fused(flat, cb, use_pallas=None):
    """Nearest-code lookup + quantized vectors + EMA statistics.

    flat: [N, D]; cb: [K, D].  Returns (idx [N] int32, quantized [N, D],
    counts [K], embed_sum [D, K]).  No gradients flow through (EMA path).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    flat = jax.lax.stop_gradient(flat)
    cb = jax.lax.stop_gradient(cb)
    if use_pallas:
        return _vq_fused_pallas(flat, cb)
    return _vq_fused_xla(flat, cb)


def vq_fused_reference(flat, cb):
    """Numpy oracle for tests."""
    flat = np.asarray(flat, np.float32)
    cb = np.asarray(cb, np.float32)
    scores = (cb**2).sum(1)[None, :] - 2.0 * flat @ cb.T
    idx = scores.argmin(1)
    onehot = np.eye(cb.shape[0], dtype=np.float32)[idx]
    return (
        idx.astype(np.int32),
        onehot @ cb,
        onehot.sum(0),
        flat.T @ onehot,
    )
