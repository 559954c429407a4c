"""DSP equivalence tests.

Follows the reference's numerical-equivalence strategy
(test/test_feature_pytorch.py): the offline numpy pipeline, the JAX device
pipeline, and torch.stft (an independent oracle) must agree to tight
tolerances.
"""

import numpy as np
import pytest
import torch

from crank_tpu.dsp import (
    get_window,
    griffin_lim,
    istft,
    itug_729_window,
    logmelfilterbank,
    low_cut_filter,
    mel_filterbank,
    mlfb_to_wav,
    stft,
    stft_np,
    convert_continuous_f0,
)

FFTL, HOP, WINL, NMELS, FMIN, FMAX = 1024, 128, 1024, 80, 80, 7600


def test_stft_np_matches_torch(speech_like_wav):
    x, fs = speech_like_wav
    S = stft_np(x, n_fft=FFTL, hop_size=HOP, win_length=WINL, window="hann")
    t = torch.stft(
        torch.from_numpy(x),
        n_fft=FFTL,
        hop_length=HOP,
        win_length=WINL,
        window=torch.hann_window(WINL, dtype=torch.float64),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    ).numpy().T
    assert S.shape == t.shape
    np.testing.assert_allclose(np.abs(S), np.abs(t), atol=1e-8)


def test_stft_jax_matches_np(speech_like_wav):
    x, fs = speech_like_wav
    S_np = stft_np(x, n_fft=FFTL, hop_size=HOP, win_length=WINL, window="hann")
    S_jax = np.asarray(stft(x.astype(np.float32), n_fft=FFTL, hop_size=HOP,
                            win_length=WINL, window="hann"))
    assert S_np.shape == S_jax.shape
    np.testing.assert_allclose(np.abs(S_jax), np.abs(S_np), rtol=1e-4, atol=1e-3)


def test_stft_jax_noncenter_crop_alignment(speech_like_wav):
    """Non-center STFT over a frame-aligned raw crop equals the centered STFT
    rows — the dataloader crop math (reference test_feature_pytorch.py:81-126)."""
    x, fs = speech_like_wav
    batch_len, p = 64, 20
    full = np.abs(stft_np(x, n_fft=FFTL, hop_size=HOP, window="hann"))
    ref_rows = full[p : p + batch_len]
    x_mod = x[p * HOP - FFTL // 2 : p * HOP + HOP * batch_len - 1 + FFTL // 2]
    S = np.abs(np.asarray(stft(x_mod.astype(np.float32), n_fft=FFTL,
                               hop_size=HOP, window="hann", center=False)))
    assert S.shape == ref_rows.shape
    np.testing.assert_allclose(S, ref_rows, rtol=1e-3, atol=2e-3)


def test_istft_roundtrip(speech_like_wav):
    x, fs = speech_like_wav
    x = x[: HOP * 100].astype(np.float32)
    S = stft(x, n_fft=FFTL, hop_size=HOP, window="hann")
    y = np.asarray(istft(S, n_fft=FFTL, hop_size=HOP, window="hann",
                         length=len(x)))
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 1024, 80, 80, 7600)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # every filter has nonzero support, triangles overlap
    assert (fb.sum(axis=1) > 0).all()
    # slaney normalization: peak of each filter roughly 2/bandwidth
    assert fb.max() < 0.1


def test_logmelfilterbank_shapes(speech_like_wav):
    x, fs = speech_like_wav
    m = logmelfilterbank(x, fs, hop_size=HOP, fft_size=FFTL, win_length=WINL,
                         window="hann", num_mels=NMELS, fmin=FMIN, fmax=FMAX)
    assert m.shape == (1 + len(x) // HOP, NMELS)
    assert np.isfinite(m).all()


def test_griffin_lim_reconstruction_quality(speech_like_wav):
    """GL from the true magnitude must correlate strongly with the source."""
    x, fs = speech_like_wav
    x = x[: HOP * 127]
    S = np.abs(stft_np(x, n_fft=FFTL, hop_size=HOP, window="hann"))
    y = griffin_lim(S, n_fft=FFTL, hop_size=HOP, win_length=WINL, n_iters=60)
    Sy = np.abs(stft_np(np.asarray(y, dtype=np.float64), n_fft=FFTL,
                        hop_size=HOP, window="hann"))
    n = min(len(S), len(Sy))
    err = np.linalg.norm(Sy[:n] - S[:n]) / np.linalg.norm(S[:n])
    assert err < 0.15, f"spectral convergence too poor: {err}"


def test_mlfb_to_wav_runs(speech_like_wav):
    x, fs = speech_like_wav
    m = logmelfilterbank(x, fs, hop_size=HOP, fft_size=FFTL, win_length=WINL,
                         window="hann", num_mels=NMELS, fmin=FMIN, fmax=FMAX)
    y = mlfb_to_wav(m[:200], fs=fs, n_mels=NMELS, n_fft=FFTL,
                    win_length=WINL, hop_size=HOP, fmin=FMIN, fmax=FMAX,
                    n_iters=8)
    assert y.shape == (HOP * 199,)
    assert np.isfinite(y).all()


def test_low_cut_filter_removes_dc(speech_like_wav):
    x, fs = speech_like_wav
    x = x + 0.5  # DC offset
    y = low_cut_filter(x, fs, cutoff=70)
    # a 255-tap FIR at 70 Hz attenuates but can't null DC; match scipy oracle
    from scipy.signal import firwin, lfilter

    ref = lfilter(firwin(255, 70 / (fs // 2), pass_zero=False), 1, x)
    np.testing.assert_allclose(y, ref)
    assert abs(np.mean(y[2000:])) < abs(np.mean(x[2000:]))


def test_itug_window():
    w = itug_729_window(1024)
    assert w.shape == (1024,)
    assert w.max() <= 1.0 + 1e-9 and w.min() >= -1e-9
    # asymmetric: hamming-ish rise, cosine tail
    assert w[0] < 0.2 and w[-1] < w[len(w) - len(w) // 6]


def test_window_periodic_vs_symmetric():
    ws = get_window("hann", 16, periodic=False)
    wp = get_window("hann", 16, periodic=True)
    assert not np.allclose(ws, wp)
    tw = torch.hann_window(16).numpy()
    np.testing.assert_allclose(wp, tw, atol=1e-7)


def test_convert_continuous_f0():
    f0 = np.array([0, 0, 100, 110, 0, 0, 130, 0], dtype=float)
    uv, cf0 = convert_continuous_f0(f0)
    np.testing.assert_array_equal(uv, [0, 0, 1, 1, 0, 0, 1, 0])
    assert cf0[0] == 100 and cf0[-1] == 130
    # linear interpolation between idx3 (110) and idx6 (130)
    np.testing.assert_allclose(cf0[4:6], [110 + 20 / 3, 110 + 40 / 3])
    assert (cf0 > 0).all()
