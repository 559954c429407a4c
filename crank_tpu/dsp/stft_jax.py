"""Batched JAX STFT / iSTFT for TPU.

The framing is expressed as ``conv_general_dilated_patches`` (a strided
reshape XLA lowers efficiently) followed by an rFFT; overlap-add in the
inverse uses a scatter-add. Matches librosa/torch framing conventions so the
on-device frontend is numerically interchangeable with the offline extractor
(the reference proves the same property for its torch frontend in
test/test_feature_pytorch.py).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from crank_tpu.dsp.windows import get_window, pad_center as _pad_center


def full_window(window, win_length, n_fft, periodic=True) -> np.ndarray:
    """Window padded (centered) to n_fft taps."""
    return _pad_center(
        np.asarray(get_window(window, win_length, periodic=periodic)), n_fft
    )


def frame_signal(x: jax.Array, frame_length: int, hop_size: int) -> jax.Array:
    """Frame [B, L] into overlapping windows [B, T, frame_length]."""
    patches = jax.lax.conv_general_dilated_patches(
        x[:, None, :],
        filter_shape=(frame_length,),
        window_strides=(hop_size,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return jnp.transpose(patches, (0, 2, 1))


@partial(jax.jit, static_argnames=("n_fft", "hop_size", "center", "pad_mode"))
def _stft_impl(x, win, *, n_fft, hop_size, center, pad_mode):
    if center:
        x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode=pad_mode)
    frames = frame_signal(x, n_fft, hop_size) * win[None, None, :]
    return jnp.fft.rfft(frames, axis=-1)


def stft(
    x,
    n_fft=1024,
    hop_size=128,
    win_length=None,
    window="hann",
    center=True,
    pad_mode="reflect",
):
    """Batched STFT: x [B, L] (or [L]) -> complex [B, T, 1 + n_fft//2]."""
    x = jnp.asarray(x)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    win_length = n_fft if win_length is None else win_length
    win = jnp.asarray(full_window(window, win_length, n_fft), dtype=x.dtype)
    out = _stft_impl(
        x, win, n_fft=n_fft, hop_size=hop_size, center=center, pad_mode=pad_mode
    )
    return out[0] if squeeze else out


def _overlap_add(frames, hop_size):
    """OLA of [B, T, n_fft] frames at stride hop -> [B, n_fft + hop*(T-1)].

    When hop divides n_fft this is computed as R = n_fft//hop shifted
    reshape-adds (pure slicing, vectorizes on the VPU); TPU scatter-add with
    colliding indices would serialize.
    """
    B, T, n_fft = frames.shape
    out_len = n_fft + hop_size * (T - 1)
    if n_fft % hop_size == 0:
        R = n_fft // hop_size
        chunks = frames.reshape(B, T, R, hop_size)
        rows = T + R - 1
        y = jnp.zeros((B, rows, hop_size), dtype=frames.dtype)
        for j in range(R):
            y = y.at[:, j : j + T].add(chunks[:, :, j])
        return y.reshape(B, rows * hop_size)[:, :out_len]
    idx = hop_size * jnp.arange(T)[:, None] + jnp.arange(n_fft)[None, :]
    return jnp.zeros((B, out_len), dtype=frames.dtype).at[:, idx].add(frames)


@partial(jax.jit, static_argnames=("n_fft", "hop_size", "center", "length"))
def _istft_impl(S, win, *, n_fft, hop_size, center, length):
    B, T, _ = S.shape
    frames = jnp.fft.irfft(S, n=n_fft, axis=-1) * win[None, None, :]
    out_len = n_fft + hop_size * (T - 1)
    y = _overlap_add(frames, hop_size)
    wss = _overlap_add(
        jnp.broadcast_to(win**2, (1, T, n_fft)), hop_size
    )[0]
    y = y / jnp.maximum(wss, 1e-10)[None, :]
    if center:
        y = y[:, n_fft // 2 : out_len - n_fft // 2]
    if length is not None:
        y = y[:, :length]
        y = jnp.pad(y, ((0, 0), (0, max(0, length - y.shape[1]))))
    return y


def istft(
    S,
    n_fft=None,
    hop_size=128,
    win_length=None,
    window="hann",
    center=True,
    length=None,
):
    """Inverse STFT with window-sum-square normalization.

    S: complex [B, T, F] (or [T, F]); returns [B, L] (or [L]).
    """
    S = jnp.asarray(S)
    squeeze = S.ndim == 2
    if squeeze:
        S = S[None]
    n_fft = 2 * (S.shape[-1] - 1) if n_fft is None else n_fft
    win_length = n_fft if win_length is None else win_length
    win = jnp.asarray(full_window(window, win_length, n_fft), dtype=jnp.float32)
    out = _istft_impl(
        S, win, n_fft=n_fft, hop_size=hop_size, center=center, length=length
    )
    return out[0] if squeeze else out
