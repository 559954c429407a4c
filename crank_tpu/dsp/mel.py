"""Slaney-style mel filterbank (librosa-compatible, first-party).

Numerically equivalent to ``librosa.filters.mel`` with ``htk=False`` and
``norm='slaney'`` — the canonical basis used throughout the reference
(crank/feature/feature.py:134-145 via parallel_wavegan's ``logmelfilterbank``
and crank/net/module/mlfb.py:27-35).
"""

import numpy as np


def hz_to_mel(freq, htk: bool = False):
    freq = np.asanyarray(freq, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    if np.ndim(freq):
        log_t = freq >= min_log_hz
        mels = np.where(
            log_t,
            min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep,
            mels,
        )
    elif freq >= min_log_hz:
        mels = min_log_mel + np.log(freq / min_log_hz) / logstep
    return mels


def mel_to_hz(mels, htk: bool = False):
    mels = np.asanyarray(mels, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    if np.ndim(mels):
        log_t = mels >= min_log_mel
        freqs = np.where(
            log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs
        )
    elif mels >= min_log_mel:
        freqs = min_log_hz * np.exp(logstep * (mels - min_log_mel))
    return freqs


def mel_frequencies(n_mels, fmin, fmax, htk: bool = False):
    min_mel = hz_to_mel(fmin, htk=htk)
    max_mel = hz_to_mel(fmax, htk=htk)
    mels = np.linspace(min_mel, max_mel, n_mels)
    return mel_to_hz(mels, htk=htk)


def mel_filterbank(
    fs, n_fft, n_mels=80, fmin=0.0, fmax=None, htk=False, norm="slaney"
) -> np.ndarray:
    """Triangular mel filterbank matrix of shape (n_mels, 1 + n_fft//2)."""
    if fmax is None:
        fmax = float(fs) / 2
    n_freqs = 1 + n_fft // 2
    weights = np.zeros((n_mels, n_freqs))
    fftfreqs = np.linspace(0.0, float(fs) / 2, n_freqs)
    mel_f = mel_frequencies(n_mels + 2, fmin, fmax, htk=htk)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
        weights *= enorm[:, None]
    return weights


def mel_pseudo_inverse(fs, n_fft, n_mels, fmin=None, fmax=None) -> np.ndarray:
    """Pseudo-inverse of the mel basis (crank/utils/utils.py:210-234 path)."""
    fmin = 0 if fmin is None else fmin
    fmax = fs / 2 if fmax is None else fmax
    basis = mel_filterbank(fs, n_fft, n_mels, fmin, fmax)
    return np.linalg.pinv(basis)
