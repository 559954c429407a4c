"""Differentiable raw-waveform frontends (on-the-fly feature extraction).

JAX re-designs of the reference's torch layers:
* LogMelFilterBank — crank/net/module/mlfb.py:19-171 (STFT -> |.| -> mel ->
  log10 -> optional frozen scaler), window modes "hann" (fixed), "param"
  (learnable window taps), "conv" (signal-adaptive gain predicted by a conv).
* SincConvFrontend — crank/net/module/sinc_conv.py (ESPnet-style learnable
  band-pass sinc filters + LeakyReLU/max-pool downsampling whose product must
  equal the STFT hop size).
"""

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from crank_tpu.dsp.mel import mel_filterbank
from crank_tpu.dsp.stft_jax import frame_signal
from crank_tpu.dsp.windows import get_window


class LogMelFilterBank(nn.Module):
    fs: int = 22050
    hop_size: int = 128
    fft_size: int = 1024
    win_length: Optional[int] = None
    window: str = "hann"  # "hann" | "hamming" | "param" | "conv"
    center: bool = False
    n_mels: int = 80
    fmin: Optional[float] = None
    fmax: Optional[float] = None
    eps: float = 1e-10
    scaler_mean: Optional[Tuple[float, ...]] = None
    scaler_std: Optional[Tuple[float, ...]] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: raw waveform [B, L] -> log-mel [B, T, n_mels]."""
        n_fft = self.fft_size
        win_length = self.win_length or n_fft

        if self.window == "param":
            # periodic init: the reference seeds the learnable window with
            # scipy get_window("hann", N) whose default fftbins=True is the
            # periodic variant (mlfb.py:73-76)
            win = self.param(
                "window",
                lambda _: jnp.asarray(
                    get_window("hann", win_length, periodic=True), jnp.float32
                ),
            )
        elif self.window == "conv":
            # signal-adaptive windowing: a small conv net predicts a per-sample
            # gain in (0,1) applied to the waveform before rectangular framing
            gain = nn.Conv(features=24, kernel_size=(65,), padding="SAME")(
                x[..., None]
            )
            x = x * jnp.mean(jax.nn.sigmoid(gain), axis=-1)
            win = jnp.ones((win_length,), jnp.float32)
        else:
            win = jnp.asarray(
                get_window(self.window, win_length, periodic=True), jnp.float32
            )

        lpad = (n_fft - win_length) // 2
        win_full = jnp.pad(win, (lpad, n_fft - win_length - lpad))

        if self.center:
            x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
        frames = frame_signal(x, n_fft, self.hop_size) * win_full[None, None, :]
        spec = jnp.fft.rfft(frames, axis=-1)
        # tiny eps inside the sqrt: at exactly-zero bins (zero-padded raw
        # frames) d(sqrt)/dx is otherwise inf and the window/gain params get
        # NaN gradients on the first step.  1e-24 keeps the amplitude of
        # silent bins (~1e-12) far below the mel clamp eps (1e-10), so
        # forward values stay bit-comparable to the reference.
        amplitude = jnp.sqrt(spec.real**2 + spec.imag**2 + 1e-24)

        fmin = 0.0 if self.fmin is None else self.fmin
        fmax = self.fs / 2 if self.fmax is None else self.fmax
        basis = jnp.asarray(
            mel_filterbank(self.fs, n_fft, self.n_mels, fmin, fmax).T,
            jnp.float32,
        )
        mlfb = jnp.log10(jnp.maximum(amplitude @ basis, self.eps))
        if self.scaler_mean is not None:
            mean = jnp.asarray(self.scaler_mean, jnp.float32)
            std = jnp.asarray(self.scaler_std, jnp.float32)
            mlfb = (mlfb - mean) / std
        return mlfb


class SincConv(nn.Module):
    """Learnable band-pass sinc filter bank (mel- or bark-scale init)."""

    channels: int = 32
    kernel_size: int = 65
    fs: float = 22050.0
    scale_type: str = "mel"

    @staticmethod
    def _mel_bank(channels: int, fs: float) -> np.ndarray:
        conv = lambda f: 1125.0 * np.log(f / 700.0 + 1.0)  # noqa: E731
        inv = lambda m: 700.0 * (np.exp(m / 1125.0) - 1.0)  # noqa: E731
        freqs = inv(np.linspace(conv(30.0), conv(fs * 0.5), channels + 2))
        return np.stack([freqs[:-2], freqs[2:]], axis=1)

    @staticmethod
    def _bark_bank(channels: int, fs: float) -> np.ndarray:
        conv = lambda f: ((f / 1000.0) ** 2 * 1.4 + 1.0) ** 0.69 * 75.0 + 25.0  # noqa: E731
        inv = lambda b: ((((b - 25.0) / 75.0) ** (1.0 / 0.69) - 1.0) / 1.4) ** 0.5 * 1000.0  # noqa: E731
        centers = inv(np.linspace(conv(70.0), conv(fs * 0.45), channels))
        bw = conv(centers)
        return np.stack([centers - bw / 2, centers + bw / 2], axis=1)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, L] -> [B, L, channels] (stride 1, 'same' padding)."""
        if self.kernel_size % 2 == 0:
            raise ValueError("SincConv kernel size must be odd")
        bank = (
            self._mel_bank if self.scale_type == "mel" else self._bark_bank
        )(self.channels, self.fs)
        f = self.param(
            "f", lambda _: jnp.asarray(bank / self.fs, jnp.float32)
        )
        n = self.kernel_size // 2
        grid = 2.0 * jnp.pi * jnp.arange(1, n + 1, dtype=jnp.float32)
        # hamming half-window (reference sinc_conv.py:125-129)
        lwin = 2 * n + 1
        win = 0.54 - 0.46 * jnp.cos(
            2.0 * jnp.pi * jnp.arange(n, 0, -1, dtype=jnp.float32) / lwin
        )
        f_min = jnp.abs(f[:, 0])
        f_max = f_min + jnp.abs(f[:, 1] - f[:, 0])
        right = (
            (jnp.sin(f_max[:, None] * grid) - jnp.sin(f_min[:, None] * grid))
            / (0.5 * grid)
        ) * win
        center = (2.0 * (f_max - f_min))[:, None]
        filters = jnp.concatenate([right[:, ::-1], center, right], axis=1)
        # conv: [B, L, 1] * kernel [K, 1, C]
        kernel = filters.T[:, None, :]
        y = jax.lax.conv_general_dilated(
            x[:, :, None],
            kernel,
            window_strides=(1,),
            padding="SAME",
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        return y


class SincConvFrontend(nn.Module):
    """SincConv + conv/LeakyReLU/max-pool downsampling to frame rate.

    prod(pool_kernel_sizes) must equal hop_size (checked by the model builder,
    reference crank/net/module/vqvae2.py:68-75).
    """

    sinc_channels: int = 32
    sinc_kernel_size: int = 65
    out_channels: int = 80
    pool_kernel_sizes: Tuple[int, ...] = (4, 4, 4, 2)
    fs: float = 22050.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, L] -> [B, L // prod(pools), out_channels]."""
        h = SincConv(
            channels=self.sinc_channels,
            kernel_size=self.sinc_kernel_size,
            fs=self.fs,
        )(x)
        # log compression (ESPnet LogCompression)
        h = jnp.log(jnp.abs(h) + 1.0)
        n_layers = len(self.pool_kernel_sizes)
        for i, k in enumerate(self.pool_kernel_sizes):
            feats = self.out_channels if i == n_layers - 1 else self.sinc_channels
            h = nn.Conv(features=feats, kernel_size=(k,), padding=k // 2)(h)
            h = nn.leaky_relu(h, 0.01)
            h = nn.max_pool(h, window_shape=(k,), strides=(k,))
        return h
