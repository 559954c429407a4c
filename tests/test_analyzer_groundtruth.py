"""Native analyzer accuracy against analytically KNOWN ground truth.

VERDICT r2 #2: the first-party WORLD-role analyzer (crank_tpu/native) was
previously gated only by positivity/roundtrip/realism checks; nothing
bounded its envelope recovery against a known transfer function.  Here the
test signal is an impulse train (flat-envelope source) driven through a
cascade of four formant resonators whose power response |H(f)|^2 is
computed analytically — so F0, spectral envelope and (for the
harmonic+noise variant) band aperiodicity all have closed-form truth.

The measured bounds are recorded in docs/ANALYZER_BIAS.md as the stated
cross-framework MCD comparability bound (reference analyzer:
crank/feature/feature.py:75-107 via pyworld; unavailable offline).
"""

import numpy as np
import pytest

from crank_tpu.native import world

FS = 22050
FFTL = 1024
SHIFTMS = 5.0
# exactly 200 samples/period: per-impulse rounding would otherwise inject
# ±0.5-sample timing jitter — i.e. REAL source aperiodicity that the
# aperiodicity gates would wrongly charge to the analyzer
F0_TRUE = FS / 200.0  # 110.25 Hz
# (center Hz, bandwidth Hz) — /a/-like formant cascade.  Bandwidths are
# kept >= the harmonic spacing so the peaks are actually sampled by the
# excitation harmonics (no analyzer can recover what the source never
# probes).
FORMANTS = ((660, 150), (1720, 200), (2410, 250), (3500, 300))
# a parallel feedthrough path bounds the cascade's spectral dynamic range
# (~40 dB): below that the physical signal would be numerical noise and
# the "truth" unmeasurable by construction
DIRECT_GAIN = 8.0
MCEP_DIM = 34
ALPHA = 0.466


def _resonator_coeffs(f, bw):
    r = np.exp(-np.pi * bw / FS)
    theta = 2 * np.pi * f / FS
    return np.array([1.0, -2 * r * np.cos(theta), r * r])


def _true_power_envelope(freqs):
    """|H(f)|^2 of the formant cascade + direct path on the grid."""
    w = 2 * np.pi * freqs / FS
    z = np.exp(1j * w)
    h = np.ones_like(z)
    for f, bw in FORMANTS:
        a = _resonator_coeffs(f, bw)
        h = h / (a[0] + a[1] / z + a[2] / z**2)
    return np.abs(h + DIRECT_GAIN) ** 2


def _formant_signal(rng, dur=1.0, noise_db=-60.0):
    n = int(FS * dur)
    x = np.zeros(n)
    period = FS / F0_TRUE
    x[(np.arange(0, n, period)).astype(int)] = 1.0
    from scipy.signal import lfilter

    y = x.copy()
    for f, bw in FORMANTS:
        y = lfilter([1.0], _resonator_coeffs(f, bw), y)
    y = y + DIRECT_GAIN * x  # parallel direct path (see DIRECT_GAIN)
    y = y / np.abs(y).max()
    y += 10 ** (noise_db / 20) * rng.standard_normal(n)
    return y


@pytest.fixture(scope="module")
def analysis():
    rng = np.random.default_rng(7)
    x = _formant_signal(rng)
    f0 = world.f0_analyze(x, FS, shiftms=SHIFTMS, minf0=60, maxf0=300)
    spc = world.spectral_envelope(x, f0, FS, shiftms=SHIFTMS, fftl=FFTL)
    return x, f0, spc


def test_f0_recovery(analysis):
    _, f0, _ = analysis
    voiced = f0[f0 > 0]
    # interior frames (exclude onset/offset transients)
    assert len(voiced) > 100
    err = np.abs(np.median(voiced) - F0_TRUE)
    assert err < 1.0, f"median F0 error {err:.2f} Hz"
    # at least 90% of voiced frames within 5 Hz
    frac = np.mean(np.abs(voiced - F0_TRUE) < 5.0)
    assert frac > 0.9, f"only {frac:.2%} of voiced frames within 5 Hz"


def _mean_offset_db(est_db, true_db):
    return est_db - np.mean(est_db) + np.mean(true_db)


def test_envelope_recovery_db(analysis):
    """dB RMS error of the recovered log-envelope in the 80-7600 Hz band
    (scale-free: constant gain offset removed)."""
    _, f0, spc = analysis
    freqs = np.arange(FFTL // 2 + 1) * FS / FFTL
    band = (freqs >= 80) & (freqs <= 7600)
    true_db = 10 * np.log10(_true_power_envelope(freqs[band]))

    voiced = f0 > 0
    errs = []
    for t in np.where(voiced)[0][10:-10]:
        est_db = 10 * np.log10(np.maximum(spc[t, band], 1e-30))
        est_db = _mean_offset_db(est_db, true_db)
        errs.append(np.sqrt(np.mean((est_db - true_db) ** 2)))
    rms_db = float(np.median(errs))
    print(f"envelope recovery: median RMS error {rms_db:.2f} dB")
    # bound documented in docs/ANALYZER_BIAS.md
    assert rms_db < 6.0, f"envelope RMS error {rms_db:.2f} dB"


def _mcd(mc_a, mc_b):
    diff = mc_a[..., 1:] - mc_b[..., 1:]
    return float(np.mean(
        10.0 / np.log(10.0) * np.sqrt(2.0 * np.sum(diff**2, axis=-1))
    ))


def test_envelope_mcd_vs_truth(analysis):
    """mcep-domain MCD between the recovered envelope and the analytic
    envelope — the metric-domain form of the analyzer bias: stage-7 MCD
    numbers computed through this analyzer carry at most ~this offset
    relative to an ideal analyzer."""
    _, f0, spc = analysis
    freqs = np.arange(FFTL // 2 + 1) * FS / FFTL
    true_pow = _true_power_envelope(freqs)

    voiced_idx = np.where(f0 > 0)[0][10:-10]
    est = spc[voiced_idx]
    # scale-align each frame to the true envelope (MCD is translation-
    # sensitive through c0 only, which is excluded, but keep frames honest)
    true_mat = np.tile(true_pow, (len(voiced_idx), 1))
    mc_est = world.sp2mc(est, MCEP_DIM, ALPHA)
    mc_true = world.sp2mc(true_mat, MCEP_DIM, ALPHA)
    mcd = _mcd(mc_est, mc_true)
    print(f"analyzer envelope MCD vs truth: {mcd:.3f} dB")
    # bound documented in docs/ANALYZER_BIAS.md
    assert mcd < 3.0, f"envelope MCD {mcd:.3f} dB"


def test_band_aperiodicity_ordering():
    """Harmonic+noise signal with known per-band noise ratio: the low band
    (pure harmonics) must read near-periodic, the high band (noise-only
    above 5 kHz) near-aperiodic."""
    rng = np.random.default_rng(11)
    x = _formant_signal(rng, noise_db=-80.0)
    from scipy.signal import butter, sosfilt

    sos_hi = butter(6, 5000 / (FS / 2), "highpass", output="sos")
    noise = sosfilt(sos_hi, rng.standard_normal(len(x)))
    noise = noise / np.sqrt(np.mean(noise**2))
    # high-band noise 10 dB below the harmonic signal's RMS: the >5 kHz
    # region is then noise-dominated (the formant cascade is ~-30 dB
    # there) while the F0 band stays clean enough to track
    y = x + noise * np.sqrt(np.mean(x**2)) * 10 ** (-10 / 20)

    f0 = world.f0_analyze(y, FS, shiftms=SHIFTMS, minf0=60, maxf0=300)
    cap = world.band_aperiodicity(y, f0, FS, shiftms=SHIFTMS, fftl=FFTL)
    voiced = f0 > 0
    assert voiced.sum() > 50
    cap_v = cap[voiced]
    nb = cap_v.shape[1]
    # dB aperiodicity: more negative = more periodic.  Measured (see
    # docs/ANALYZER_BIAS.md): clean band ~-31 dB, noise band ~-0.3 dB.
    low, high = cap_v[:, 0], cap_v[:, nb - 1]
    assert np.median(low) < -20.0, f"low band {np.median(low):.1f} dB"
    assert np.median(high) > -3.0, f"high band {np.median(high):.1f} dB"

    # and on the exactly-periodic signal every band must read periodic
    f0p = world.f0_analyze(x, FS, shiftms=SHIFTMS, minf0=60, maxf0=300)
    capp = world.band_aperiodicity(x, f0p, FS, shiftms=SHIFTMS, fftl=FFTL)
    capp_v = capp[f0p > 0]
    assert np.median(capp_v[:, 0]) < -40.0
    assert np.median(capp_v[:, nb - 1]) < -20.0
