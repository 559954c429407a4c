"""Native (C++) vocoder + evaluation tests."""

import numpy as np
import pytest

from crank_tpu.native import world


@pytest.fixture(scope="module")
def voiced_signal():
    fs = 22050
    t = np.arange(int(fs * 0.8)) / fs
    f0_true = 150 + 20 * np.sin(2 * np.pi * 2 * t)
    phase = 2 * np.pi * np.cumsum(f0_true) / fs
    x = 0.5 * np.sin(phase) + 0.25 * np.sin(2 * phase) + 0.12 * np.sin(3 * phase)
    return x, fs, f0_true


def test_f0_accuracy(voiced_signal):
    x, fs, f0_true = voiced_signal
    f0 = world.f0_analyze(x, fs, shiftms=5.0, minf0=70, maxf0=340)
    hop = int(round(5.0 / 1000 * fs))
    v = f0 > 0
    assert v.mean() > 0.9
    ref = f0_true[::hop][: len(f0)]
    err = np.abs(f0[v] - ref[: len(f0)][v]) / ref[: len(f0)][v]
    assert np.median(err) < 0.02, f"median rel err {np.median(err)}"


def test_f0_unvoiced_silence():
    fs = 22050
    x = np.zeros(fs // 2)
    f0 = world.f0_analyze(x, fs, shiftms=5.0, minf0=70, maxf0=340)
    assert (f0 == 0).all()


def test_envelope_shapes_and_positivity(voiced_signal):
    x, fs, _ = voiced_signal
    f0 = world.f0_analyze(x, fs, minf0=70, maxf0=340)
    spc = world.spectral_envelope(x, f0, fs, fftl=1024)
    assert spc.shape == (len(f0), 513)
    assert (spc > 0).all() and np.isfinite(spc).all()
    # harmonic energy region should dominate far-off regions
    voiced = spc[f0 > 0]
    assert voiced[:, 5:40].mean() > voiced[:, 400:].mean()


def test_aperiodicity_voiced_vs_noise(voiced_signal):
    x, fs, _ = voiced_signal
    noise = 0.3 * np.random.default_rng(0).standard_normal(len(x))
    f0x = world.f0_analyze(x, fs, minf0=70, maxf0=340)
    capx = world.band_aperiodicity(x, f0x, fs)
    # fake-voiced analysis of pure noise should show higher aperiodicity
    f0n = np.full_like(f0x, 150.0)
    capn = world.band_aperiodicity(noise, f0n, fs)
    assert capx[f0x > 0][:, 0].mean() < capn[:, 0].mean()
    ap = world.decode_aperiodicity(capx, fs, 1024)
    assert ap.shape == (len(f0x), 513)
    assert (ap >= 0).all() and (ap <= 1.0).all()


def test_code_decode_aperiodicity_roundtrip():
    fs, fftl = 22050, 1024
    nb = world.n_aperiodicities(fs)
    cap = np.linspace(-30, -5, nb)[None].repeat(4, 0)
    full = world.decode_aperiodicity(cap, fs, fftl)
    cap2 = world.code_aperiodicity(full, fs, fftl)
    np.testing.assert_allclose(cap2, cap, atol=0.5)


def test_sp2mc_mc2sp_roundtrip():
    rng = np.random.default_rng(0)
    half = 513
    c_true = np.zeros((3, half))
    c_true[:, :16] = rng.standard_normal((3, 16)) * np.exp(-np.arange(16) / 4)
    logS = np.fft.rfft(
        np.concatenate([c_true, c_true[:, -2:0:-1]], 1), axis=1
    ).real
    S = np.exp(logS)
    mc = world.sp2mc(S, dim=34, alpha=0.466)
    assert mc.shape == (3, 35)
    S2 = world.mc2sp(mc, alpha=0.466, fftl=1024)
    lsd = np.sqrt(np.mean((np.log(S) - np.log(S2)) ** 2))
    assert lsd < 0.1, lsd


def test_mod_power():
    rng = np.random.default_rng(1)
    mc = rng.standard_normal((5, 25)) * 0.1
    louder = np.copy(mc)
    louder[:, 0] += 1.0  # +1 log energy
    out = world.mod_power(mc, louder, alpha=0.466)
    e_out = world.mc2e(out, alpha=0.466)
    e_ref = world.mc2e(louder, alpha=0.466)
    np.testing.assert_allclose(np.log(e_out), np.log(e_ref), atol=0.1)


def test_synthesis_roundtrip(voiced_signal):
    x, fs, _ = voiced_signal
    f0, spc, ap = world.analyze(x, fs, fftl=1024, shiftms=5.0,
                                minf0=70, maxf0=340)
    y = world.synthesize(f0, spc, ap, fs, shiftms=5.0)
    assert len(y) == len(f0) * int(round(5.0 / 1000 * fs))
    assert np.isfinite(y).all()
    # resynthesis energy within 2x of original, f0 preserved
    rms_x = np.sqrt(np.mean(x**2))
    rms_y = np.sqrt(np.mean(y**2))
    assert 0.3 < rms_y / rms_x < 3.0
    f0y = world.f0_analyze(y, fs, minf0=70, maxf0=340)
    n = min(len(f0), len(f0y))
    f0, f0y = f0[:n], f0y[:n]
    v = (f0 > 0) & (f0y > 0)
    assert v.mean() > 0.7
    rel = np.abs(f0y[v] - f0[v]) / f0[v]
    assert np.median(rel) < 0.05


def test_world2wav_mcep_path(voiced_signal):
    x, fs, _ = voiced_signal
    f0, spc, ap = world.analyze(x, fs, fftl=1024, minf0=70, maxf0=340)
    mcep = world.sp2mc(spc, dim=34, alpha=0.466)
    cap = world.code_aperiodicity(ap, fs, 1024)
    y = world.world2wav(f0, mcep, cap, rmcep=mcep, fs=fs, fftl=1024,
                        shiftms=5.0, alpha=0.466)
    assert np.isfinite(y).all() and np.abs(y).max() <= 1.0
    assert np.sqrt(np.mean(y**2)) > 0.01


def test_dtw_identity_and_shift():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((50, 4))
    pa, pb = world.dtw(a, a)
    np.testing.assert_array_equal(pa, pb)
    # shifted copy: the overlapping suffix must align exactly diagonally
    b = a[10:]
    pa, pb = world.dtw(a, b)
    suffix = pa >= 10
    np.testing.assert_array_equal(pa[suffix] - 10, pb[suffix])
    d = np.sum((a[pa[suffix]] - b[pb[suffix]]) ** 2)
    assert d < 1e-12


def test_spc2npow(voiced_signal):
    x, fs, _ = voiced_signal
    f0, spc, _ = world.analyze(x, fs, minf0=70, maxf0=340)
    npow = world.spc2npow(spc)
    assert npow.shape == (len(f0),)
    assert np.isfinite(npow).all()


def test_feature_extractor_full(tmp_path, voiced_signal):
    """Full offline extraction writes all reference feature keys
    (crank/feature/feature.py parity)."""
    import h5py

    from crank_tpu.features.extractor import FeatureExtractor
    from crank_tpu.utils.audio_io import write_wav

    x, fs, _ = voiced_signal
    wavf = tmp_path / "SF1_001.wav"
    write_wav(wavf, x, fs)
    conf = {
        "fs": fs, "fftl": 1024, "win_length": 1024, "hop_size": 128,
        "window_types": ["hann"], "fmin": 80, "fmax": 7600, "mlfb_dim": 80,
        "n_iteration": 4, "framems": 20, "shiftms": 5.80499,
        "mcep_dim": 34, "mcep_alpha": 0.466,
    }
    fe = FeatureExtractor(tmp_path / "feat", conf,
                          {"minf0": 70, "maxf0": 340, "npow": -20})
    h5f = fe.analyze(str(wavf), synth_flag=True)
    with h5py.File(h5f, "r") as fp:
        for k in ("mlfb", "f0", "spc", "ap", "uv", "cf0", "lf0", "lcf0",
                  "mcep", "npow", "cap", "ccap", "cap_uv", "raw", "x_anasyn"):
            assert k in fp, k
        assert fp["mlfb"].shape[1] == 80
        assert fp["mcep"].shape[1] == 35
    assert (tmp_path / "feat" / "SF1_001_anasyn.wav").exists()
    assert (tmp_path / "feat" / "SF1_001_mlfb_gl.wav").exists()


def test_mcd_module(voiced_signal):
    from crank_tpu.eval.mcd import mcd

    x, fs, _ = voiced_signal
    f0, spc, _ = world.analyze(x, fs, minf0=70, maxf0=340)
    mc = world.sp2mc(spc, 24, 0.466)
    assert mcd(mc, f0, mc, f0) < 1e-9
    assert mcd(mc + 0.1, f0, mc, f0) > 0


def test_mosnet_random_init(voiced_signal):
    from crank_tpu.eval.mosnet import MOSNetPredictor

    x, fs, _ = voiced_signal
    pred = MOSNetPredictor(weights=None)
    s = pred.predict_wav(x[: fs // 2], fs)
    assert np.isfinite(s)


# --------------------- F0 quality gates (round-2 analyzer) -----------------


def _pseudo_speech(fs, dur, f0fn, vmask_fn, snr_db, seed):
    """Harmonic signal with syllabic AM, silence gaps and additive noise."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(fs * dur)) / fs
    f0 = f0fn(t)
    vm = vmask_fn(t)
    phase = 2 * np.pi * np.cumsum(f0) / fs
    x = sum(a * np.sin(k * phase)
            for k, a in enumerate([0.5, 0.3, 0.15, 0.08], start=1)) * vm
    x *= 0.6 + 0.4 * np.sin(2 * np.pi * 3 * t)
    noise = rng.standard_normal(len(x))
    noise *= np.sqrt(np.mean(x ** 2) / 10 ** (snr_db / 10)
                     / np.mean(noise ** 2))
    return x + noise, f0, vm


@pytest.mark.parametrize(
    "f0c,lo,hi,snr,seed",
    [(200, 70, 340, 20, 0), (95, 40, 250, 10, 1), (255, 120, 500, 15, 2)],
)
def test_f0_gpe_vde(f0c, lo, hi, snr, seed):
    """Gross pitch error ≈ 0 and voicing decision error < 12% under noise,
    vibrato and silence gaps — incl. the low-F0 (95 Hz) case that round 1's
    per-frame decision handled poorly."""
    fs = 22050
    x, f0t, vm = _pseudo_speech(
        fs, 2.0,
        lambda t: f0c * (1 + 0.12 * np.sin(2 * np.pi * 4 * t)),
        lambda t: ((t % 0.5) < 0.35).astype(float), snr, seed)
    f0 = world.f0_analyze(x, fs, shiftms=5.0, minf0=lo, maxf0=hi)
    hop = int(round(5.0 / 1000 * fs))
    ref = f0t[::hop][: len(f0)]
    vref = vm[::hop][: len(f0)].astype(bool)
    est_v = f0[: len(ref)] > 0
    assert np.mean(est_v != vref) < 0.12, "voicing decision error too high"
    both = est_v & vref
    rel = np.abs(f0[: len(ref)][both] - ref[both]) / ref[both]
    assert np.mean(rel > 0.2) < 0.005, "gross pitch errors (octave jumps)"


def test_f0_pure_noise_unvoiced():
    rng = np.random.default_rng(3)
    f0 = world.f0_analyze(rng.standard_normal(22050), 22050, 5.0, 70, 340)
    assert (f0 > 0).mean() < 0.02


def test_f0_intrinsic_precision():
    """Sub-0.1% median relative error on constant pitch (StoneMask-grade;
    the NCC parabolic refinement pass)."""
    fs = 22050
    t = np.arange(fs) / fs
    for f0c in (95.3, 151.7, 222.2, 317.9):
        x = (0.5 * np.sin(2 * np.pi * f0c * t)
             + 0.3 * np.sin(4 * np.pi * f0c * t)
             + 0.1 * np.sin(6 * np.pi * f0c * t))
        x += 0.02 * np.random.default_rng(0).standard_normal(len(x))
        f0 = world.f0_analyze(x, fs, 5.0, 60, 450)
        v = f0 > 0
        assert v.mean() > 0.95
        assert np.median(np.abs(f0[v] - f0c) / f0c) < 1e-3


REF_WAV = "/root/reference/test/data/SF1_10001.wav"


@pytest.mark.skipif(not __import__("os").path.exists(REF_WAV),
                    reason="reference speech fixture not present")
def test_f0_real_speech_track_quality():
    """On real speech: plausible female range, smooth voiced runs, no octave
    jumps (validates the Viterbi track on non-synthetic material)."""
    import scipy.io.wavfile as wavfile

    sr, w = wavfile.read(REF_WAV)
    w = w.astype(np.float64) / 32768.0
    f0 = world.f0_analyze(w, sr, 5.0, 120, 400)
    v = f0 > 0
    assert 0.3 < v.mean() < 0.7
    assert 150 < np.median(f0[v]) < 280
    run = np.abs(np.diff(np.log(np.maximum(f0, 1))))
    run = run[(f0[1:] > 0) & (f0[:-1] > 0)]
    assert (run > 0.15).mean() < 0.005, "octave jumps inside voiced runs"
