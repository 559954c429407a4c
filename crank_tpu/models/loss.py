"""Loss functions (masked, causal-shift-aware, feature-domain multi-STFT).

Functional equivalents of the reference criterion set
(crank/net/trainer/utils.py:22-37, crank/net/module/loss.py):

* ``feature_loss`` — CustomFeatureLoss: l1/mse with boolean-mask select and
  +/- causal trimming; the mean is over the selected elements (frames x dims),
  matching torch masked_select semantics.
* ``multi_stft_loss`` — feature-domain multi-resolution STFT loss: a [B, T, D]
  feature is treated as B*D 1-D time signals.  NOTE the effective STFT
  parameters reproduce the reference's (swapped) argument routing through
  crank/net/module/loss.py:50-101: n_fft = fft_sizes[i], hop = win_sizes[i],
  win_length = hop_sizes[i] with a periodic hann window of win_length taps.
* ``cross_entropy`` — CE with ignore_index = -100.
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from crank_tpu.dsp.windows import get_window


def _causal_trim(x, y, mask, causal_size: int):
    if causal_size > 0:
        x = x[:, causal_size:]
        y = y[:, :-causal_size]
        if mask is not None:
            mask = mask[:, causal_size:]
    elif causal_size < 0:
        cs = -causal_size
        y = y[:, cs:]
        x = x[:, :-cs]
        if mask is not None:
            # NOTE: trimming the mask from the END here means the last |cs|
            # valid frames pair with zero padding — this mirrors the
            # reference exactly (crank/net/module/loss.py:38-42) and is
            # kept for bit-parity rather than "fixed"
            mask = mask[:, :-cs]
    return x, y, mask


def masked_mean(err: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean of err over elements where mask (broadcast over last dim) is set."""
    if mask is None:
        return jnp.mean(err)
    m = jnp.broadcast_to(mask.astype(err.dtype), err.shape)
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)


def feature_loss(
    x,
    y,
    mask=None,
    loss_type: str = "l1",
    causal: bool = False,
    causal_size: int = 0,
):
    if causal:
        x, y, mask = _causal_trim(x, y, mask, causal_size)
    diff = x - y
    err = jnp.abs(diff) if loss_type == "l1" else diff**2
    return masked_mean(err, mask)


def mse(x, y):
    return jnp.mean((x - y) ** 2)


def l1(x, y):
    return jnp.mean(jnp.abs(x - y))


def masked_mse(x, y, mask):
    return masked_mean((x - y) ** 2, mask)


def cross_entropy(logits, labels, ignore_index: int = -100):
    """logits [N, C], labels [N]; mean over non-ignored entries."""
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[:, None], axis=-1)[:, 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def _stft_mag(x, n_fft: int, hop: int, win_length: int):
    """x: [N, T] -> magnitude [N, frames, n_fft//2+1] (torch.stft parity:
    center=True, reflect pad, clamp(|.|^2, 1e-7))."""
    win = jnp.asarray(
        np.pad(
            get_window("hann", win_length, periodic=True),
            ((n_fft - win_length) // 2, (n_fft - win_length + 1) // 2),
        ),
        x.dtype,
    )
    x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    n_frames = 1 + (x.shape[1] - n_fft) // hop
    idx = hop * jnp.arange(n_frames)[:, None] + jnp.arange(n_fft)[None, :]
    frames = x[:, idx] * win[None, None, :]
    spec = jnp.fft.rfft(frames, axis=-1)
    power = jnp.maximum(spec.real**2 + spec.imag**2, 1e-7)
    return jnp.sqrt(power)


def multi_stft_loss(
    x,
    y,
    fft_sizes: Sequence[int] = (64, 128),
    win_sizes: Sequence[int] = (64, 128),
    hop_sizes: Sequence[int] = (16, 32),
    logratio: float = 0.0,
    causal: bool = False,
    causal_size: int = 0,
):
    """Feature-domain multi-resolution STFT loss on [B, T, D] tensors."""
    if causal:
        x, y, _ = _causal_trim(x, y, None, causal_size)
    B, T, D = x.shape
    xs = jnp.transpose(x, (0, 2, 1)).reshape(-1, T)
    ys = jnp.transpose(y, (0, 2, 1)).reshape(-1, T)
    losses = []
    for n_fft, hop, win_len in zip(fft_sizes, win_sizes, hop_sizes):
        xm = _stft_mag(xs, n_fft, hop, win_len)
        ym = _stft_mag(ys, n_fft, hop, win_len)
        mag = jnp.mean(jnp.abs(xm - ym))
        if logratio > 0.0:
            lmag = jnp.mean(jnp.abs(jnp.log(xm) - jnp.log(ym)))
            losses.append((1 - logratio) * mag + logratio * lmag)
        else:
            losses.append(mag)
    return sum(losses) / len(losses)
