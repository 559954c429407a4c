"""Host-side (numpy) STFT and log-mel extraction.

Numerically matches the reference's offline pipeline: librosa.stft with
center=True / reflect padding followed by the slaney mel basis and log10
(crank/feature/feature.py:126-145 via parallel_wavegan's logmelfilterbank).
Used for offline feature extraction and as the oracle for the JAX frontend's
equivalence tests (SURVEY.md §4 pattern).
"""

import numpy as np

from crank_tpu.dsp.mel import mel_filterbank
from crank_tpu.dsp.windows import get_window, pad_center as _pad_center

EPS = 1e-10


def stft_np(
    x,
    n_fft=1024,
    hop_size=128,
    win_length=None,
    window="hann",
    center=True,
    pad_mode="reflect",
):
    """STFT of a 1-D signal; returns complex array of shape (T, 1 + n_fft//2).

    With ``window`` given as a string, a periodic window is used (librosa
    semantics); an explicit array is used as-is.
    """
    x = np.asarray(x, dtype=np.float64)
    win_length = n_fft if win_length is None else win_length
    win = _pad_center(get_window(window, win_length, periodic=True), n_fft)
    if center:
        x = np.pad(x, n_fft // 2, mode=pad_mode)
    n_frames = 1 + (len(x) - n_fft) // hop_size
    idx = np.arange(n_fft)[None, :] + hop_size * np.arange(n_frames)[:, None]
    frames = x[idx] * win[None, :]
    return np.fft.rfft(frames, axis=-1)


def logmelfilterbank(
    x,
    fs,
    hop_size=256,
    fft_size=1024,
    win_length=None,
    window="hann",
    num_mels=80,
    fmin=None,
    fmax=None,
    eps=EPS,
):
    """log10 mel filterbank features, shape (T, num_mels)."""
    spc = np.abs(
        stft_np(
            x,
            n_fft=fft_size,
            hop_size=hop_size,
            win_length=win_length,
            window=window,
            center=True,
            pad_mode="reflect",
        )
    )
    fmin = 0 if fmin is None else fmin
    fmax = fs / 2 if fmax is None else fmax
    mel_basis = mel_filterbank(fs, fft_size, num_mels, fmin, fmax)
    return np.log10(np.maximum(eps, spc @ mel_basis.T))
