#!/usr/bin/env python3
"""Pseudo-speech corpus generator (first-party, no external data).

Network egress is unavailable in the build environment, so the VCC corpora
cannot be downloaded (reference recipe role: egs/vaevc/vcc2018v1/local/
download.sh). This tool synthesizes a deterministic multi-speaker corpus of
*speech-like* utterances — syllabic structure with formant-filtered glottal
excitation, fricative onsets, F0 declination/jitter/vibrato, breath noise and
pauses — so production-scale training, conversion and MCD evaluation can be
exercised honestly end-to-end. Speakers differ in F0 statistics AND vocal
tract length (formant scale), so conversion has to move both.

Usage:
    python tools/make_pseudo_corpus.py --outdir <recipe>/downloads/wav \
        --n_utterances 60 --duration 3.0 [--fs 22050] [--seed 17]
"""

import argparse
import sys
from pathlib import Path

import numpy as np
from scipy import signal as sps

# 5-vowel inventory: (F1, F2, F3) center frequencies in Hz for a reference
# vocal tract; per-speaker scaled by vtl (vocal tract length factor).
VOWELS = {
    "a": (730, 1090, 2440),
    "e": (530, 1840, 2480),
    "i": (270, 2290, 3010),
    "o": (570, 840, 2410),
    "u": (300, 870, 2240),
}

# name -> (base_f0, f0_sd_oct, vtl, breathiness)
SPEAKERS = {
    "PF1": (215.0, 0.16, 1.00, 0.030),
    "PF2": (270.0, 0.13, 0.96, 0.045),
    "PM1": (115.0, 0.14, 1.18, 0.025),
    "PM2": (140.0, 0.17, 1.12, 0.040),
}


def _formant_filter(x, formants, fs):
    """Cascade of 2nd-order resonators (Klatt-style series synthesis)."""
    y = x
    for fc, bw in zip(formants, (90.0, 120.0, 160.0)):
        fc = min(fc, 0.45 * fs)
        r = np.exp(-np.pi * bw / fs)
        theta = 2 * np.pi * fc / fs
        a = [1.0, -2 * r * np.cos(theta), r * r]
        b = [(1 - r) * np.sqrt(1 - 2 * r * np.cos(2 * theta) + r * r)]
        y = sps.lfilter(b, a, y)
    return y


def _glottal_pulse_train(f0_track, fs, rng):
    """Impulse train with per-period jitter, LF-ish shaping via lowpass."""
    n = len(f0_track)
    exc = np.zeros(n)
    pos = 0.0
    while pos < n - 1:
        i = int(pos)
        f0 = max(f0_track[i], 1.0)
        exc[i] = 1.0
        period = fs / f0
        pos += period * (1.0 + 0.006 * rng.standard_normal())
    # spectral tilt: integrate-ish lowpass for a -12 dB/oct glottal source
    b, a = sps.butter(1, 0.9)
    return sps.lfilter(b, a, exc)


def synth_utterance(crng, srng, base_f0, f0_sd_oct, vtl, breath, fs,
                    duration):
    """crng drives CONTENT (phrase structure, phone identities, durations,
    pauses) and srng drives SPEAKER rendering (F0 perturbations, vibrato,
    jitter, breath, formant scatter).  Seeding crng by utterance index only
    makes the corpus parallel across speakers (same 'sentence' per number),
    which cross-speaker MCD evaluation assumes (VCC corpora are parallel).
    """
    n = int(fs * duration)
    x = np.zeros(n)
    t = 0
    utt_f0 = base_f0 * 2.0 ** (f0_sd_oct * srng.standard_normal() * 0.5)
    phrase_decl = crng.uniform(0.1, 0.25)  # octaves of declination per phrase
    phrase_start = t
    phrase_len = int(fs * crng.uniform(0.8, 1.6))
    vowel_keys = list(VOWELS)
    while t < n - int(0.15 * fs):
        if t - phrase_start > phrase_len:  # phrase break
            t += int(fs * crng.uniform(0.12, 0.3))
            phrase_start = t
            phrase_len = int(fs * crng.uniform(0.8, 1.6))
            continue
        # optional fricative onset: shaped noise burst
        if crng.random() < 0.45:
            flen = int(fs * crng.uniform(0.03, 0.09))
            flen = min(flen, n - t)
            noise = srng.standard_normal(flen)
            fc = crng.uniform(2500, 6000)
            b, a = sps.butter(2, min(fc / (fs / 2), 0.95), "highpass")
            burst = sps.lfilter(b, a, noise)
            burst /= max(np.sqrt(np.mean(burst ** 2)), 1e-9)
            env = np.hanning(2 * flen)[:flen]
            x[t:t + flen] += 0.05 * burst * env
            t += flen
        # vowel nucleus
        vlen = int(fs * crng.uniform(0.10, 0.24))
        vlen = min(vlen, n - t)
        if vlen < int(0.04 * fs):
            break
        tt = np.arange(vlen) / fs
        pos_in_phrase = (t - phrase_start) / max(phrase_len, 1)
        f0c = (utt_f0 * 2.0 ** (-phrase_decl * pos_in_phrase)
               * 2.0 ** (f0_sd_oct * 0.4 * srng.standard_normal()))
        vib = 1.0 + 0.015 * np.sin(2 * np.pi * srng.uniform(4.5, 6.5) * tt)
        f0_track = np.clip(f0c * vib, 40.0, 0.45 * fs)
        src = _glottal_pulse_train(f0_track, fs, srng)
        src += breath * srng.standard_normal(vlen)
        formants = np.asarray(VOWELS[crng.choice(vowel_keys)]) / vtl
        # small random formant perturbation per token (coarticulation-ish)
        formants *= 1.0 + 0.04 * srng.standard_normal(3)
        v = _formant_filter(src, formants, fs)
        v /= max(np.sqrt(np.mean(v ** 2)), 1e-9)  # resonators eat gain
        ramp = max(min(int(0.02 * fs), vlen // 2), 1)
        half = np.hanning(2 * ramp)
        amp_env = np.ones(vlen)
        amp_env[:ramp] = half[:ramp]
        amp_env[vlen - ramp:] = half[ramp:]
        x[t:t + vlen] += 0.15 * v * amp_env * srng.uniform(0.7, 1.0)
        t += vlen + int(fs * crng.uniform(0.0, 0.04))
    # room/recording floor
    x += 1.5e-4 * srng.standard_normal(n)
    peak = np.abs(x).max()
    return (0.6 * x / peak if peak > 0 else x).astype(np.float64)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--outdir", type=Path, required=True)
    parser.add_argument("--n_utterances", type=int, default=60)
    parser.add_argument("--duration", type=float, default=3.0)
    parser.add_argument("--fs", type=int, default=22050)
    parser.add_argument("--seed", type=int, default=17)
    args = parser.parse_args()

    try:
        from crank_tpu.utils.audio_io import write_wav
    except ModuleNotFoundError:  # run from a checkout without install
        sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        from crank_tpu.utils.audio_io import write_wav

    for s_idx, (name, (f0, sd, vtl, breath)) in enumerate(SPEAKERS.items()):
        outdir = args.outdir / name
        outdir.mkdir(parents=True, exist_ok=True)
        for i in range(args.n_utterances):
            # content keyed by utterance number only -> parallel corpus;
            # speaker stream keyed by (speaker, utterance)
            crng = np.random.default_rng(args.seed + i)
            srng = np.random.default_rng(
                args.seed + 7919 * (s_idx + 1) + i)
            dur = args.duration * (0.8 + 0.4 * crng.random())
            x = synth_utterance(crng, srng, f0, sd, vtl, breath, args.fs,
                                dur)
            write_wav(outdir / f"{10001 + i}.wav", x, args.fs)
        print(f"{name}: {args.n_utterances} utterances")


if __name__ == "__main__":
    main()
