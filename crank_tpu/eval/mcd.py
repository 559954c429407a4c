"""Mel-cepstral distortion evaluation.

Reference semantics (crank/bin/evaluate_mcd.py): WORLD-style re-analysis of
the converted waveform, voiced-frame selection on both sides, DTW alignment,
then MCD = mean(10/ln10 * sqrt(2 * sum(d^2))) over aligned frames.  Uses the
first-party C++ analyzer and exact DTW (crank_tpu/native).
"""

import numpy as np

from crank_tpu.dsp.filters import low_cut_filter
from crank_tpu.native import world
from crank_tpu.utils.audio_io import read_wav

MCD_COEF = 10.0 / np.log(10.0)


def get_world_mcep(wavpath, conf, spkr_conf):
    x, fs = read_wav(wavpath)
    x = np.asarray(x, dtype=np.float64)
    x = low_cut_filter(x, fs, cutoff=70)
    f0 = world.f0_analyze(
        x, conf["feature"]["fs"], shiftms=conf["feature"]["shiftms"],
        minf0=spkr_conf["minf0"], maxf0=spkr_conf["maxf0"],
    )
    spc = world.spectral_envelope(
        x, f0, conf["feature"]["fs"], shiftms=conf["feature"]["shiftms"],
        fftl=conf["feature"]["fftl"],
    )
    mcep = world.sp2mc(
        spc, dim=conf["feature"]["mcep_dim"],
        alpha=conf["feature"]["mcep_alpha"],
    )
    return mcep, f0


def mcd(cv_mcep, cv_f0, gt_mcep, gt_f0):
    """Voiced-only DTW-aligned mel-cepstral distortion in dB
    (evaluate_mcd.py:64-77).  The arrays are compared as stored — INCLUDING
    the 0th (power) coefficient: the reference's sprocket mcep returns
    c0..c_dim and its MCD runs on the full array, so published numbers are
    only comparable with the same convention (textbook MCD would drop c0)."""
    cv_f0 = np.asarray(cv_f0).reshape(-1)
    gt_f0 = np.asarray(gt_f0).reshape(-1)
    cv = np.asarray(cv_mcep)[cv_f0 > 0]
    gt = np.asarray(gt_mcep)[gt_f0 > 0]
    if len(cv) == 0 or len(gt) == 0:
        return float("nan")
    pa, pb = world.dtw(cv, gt)
    diff2sum = np.sum((cv[pa] - gt[pb]) ** 2, axis=1)
    return float(np.mean(MCD_COEF * np.sqrt(2.0 * diff2sum)))


def summarize_pairwise(results):
    """results: list of ((org, tar, number), mcd) -> {"org tar": mean}.

    Keys are tuples, not joined strings — speaker names and uids may
    contain '-' themselves (utils/naming.py contract).

    Utterances with no voiced frames after re-analysis score NaN; they are
    excluded from the pair mean (nanmean) and counted, instead of poisoning
    the whole pair (a single fully-unvoiced synthesis would otherwise erase
    the pair's score — the reference would print nan there too).
    """
    import logging

    pairwise = {}
    for (org, tar, _), v in results:
        pairwise.setdefault(f"{org} {tar}", []).append(v)
    out = {}
    for k, v in sorted(pairwise.items()):
        arr = np.asarray(v, dtype=float)
        n_nan = int(np.isnan(arr).sum())
        if n_nan:
            logging.warning(
                "pair %s: %d/%d utterances had no voiced frames "
                "(excluded from the mean)", k, n_nan, len(arr)
            )
        out[k] = (
            float(np.nanmean(arr)) if n_nan < len(arr) else float("nan")
        )
    return out
