"""Stage-1 initialization: per-speaker F0 / normalized-power histograms.

Role parity with the reference's stage-1 CLI (crank/bin/generate_histogram.py):
the user reads ``<spkr>_f0histogram.png`` / ``<spkr>_npowhistogram.png`` and
sets minf0/maxf0/npow in conf/spkr.yml accordingly.

This implementation analyzes the whole corpus as one flat joblib worklist
(rather than per-speaker pools) and draws suggested cutoffs directly on the
figures: dashed verticals at the 1st/99th F0 percentiles and the 5th npow
percentile, which is what a user would eyeball anyway.
"""

import argparse
import logging
from collections import defaultdict
from pathlib import Path

import matplotlib

matplotlib.use("Agg")  # noqa: E402  isort:skip
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np
from joblib import Parallel, delayed

from crank_tpu.dsp.filters import low_cut_filter
from crank_tpu.native import world
from crank_tpu.utils.audio_io import read_wav

logging.basicConfig(level=logging.INFO)

# metric -> (histogram range, axis label, percentile guides)
PANELS = {
    "f0": ((40, 700), "Fundamental frequency [Hz]", (1, 99)),
    "npow": ((-70, 20), "Normalized power [dB]", (5,)),
}


def analyze_one(wavf):
    """F0 track + per-frame normalized power for one utterance (wide-open
    search range — the speaker's range is what stage 1 is determining)."""
    x, fs = read_wav(wavf)
    x = low_cut_filter(x, fs, cutoff=70)
    f0 = world.f0_analyze(x, fs, shiftms=5.0, minf0=40.0, maxf0=700.0)
    npow = world.spc2npow(
        world.spectral_envelope(x, f0, fs, shiftms=5.0, fftl=1024)
    )
    return f0[f0 > 0], npow


def plot_metric(values, metric, out_png):
    rng, xlabel, guides = PANELS[metric]
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.hist(values, bins=150, range=rng, density=True, color="#4878b0",
            histtype="stepfilled")
    if len(values) == 0:
        # e.g. a speaker with zero voiced frames: emit a flat figure
        # instead of crashing the whole stage on np.percentile
        guides = ()
    for q in guides:
        p = np.percentile(values, q)
        ax.axvline(p, color="#c44e52", linestyle="--", linewidth=1)
        ax.annotate(f"p{q}={p:.0f}", (p, ax.get_ylim()[1] * 0.9),
                    fontsize=8, rotation=90, va="top")
    ax.set_xlabel(xlabel)
    ax.set_ylabel("Probability")
    out_png.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(out_png)
    plt.close(fig)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--n_jobs", type=int, default=-1)
    parser.add_argument("--wav_dir", type=str)
    parser.add_argument("--figure_dir", type=str)
    args = parser.parse_args()

    wav_dir, fig_dir = Path(args.wav_dir), Path(args.figure_dir)
    work = []  # flat (spkr, wavf) list over the whole corpus
    for spkr_dir in sorted(d for d in wav_dir.iterdir() if d.is_dir()):
        spkr = spkr_dir.name
        if all((fig_dir / f"{spkr}_{m}histogram.png").exists()
               for m in PANELS):
            logging.info("histograms exist for %s, skipping", spkr)
            continue
        work.extend((spkr, str(f)) for f in sorted(spkr_dir.glob("*.wav")))

    logging.info("analyzing %d utterances", len(work))
    results = Parallel(n_jobs=args.n_jobs)(
        delayed(analyze_one)(wavf) for _, wavf in work
    )

    per_spkr = defaultdict(lambda: {"f0": [], "npow": []})
    for (spkr, _), (f0, npow) in zip(work, results):
        per_spkr[spkr]["f0"].append(f0)
        per_spkr[spkr]["npow"].append(npow)

    for spkr, agg in per_spkr.items():
        for metric in PANELS:
            plot_metric(np.concatenate(agg[metric]), metric,
                        fig_dir / f"{spkr}_{metric}histogram.png")
        logging.info("wrote histograms for %s", spkr)


if __name__ == "__main__":
    main()
