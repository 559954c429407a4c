"""Stage-1 initialization CLI (reference: crank/bin/generate_histogram.py).

F0 and normalized-power histograms per speaker so the user can set
spkr.yml minf0/maxf0/npow by eye.
"""

import argparse
import logging
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


def create_histogram(data, figure_path, range_min=-70, range_max=20, step=10,
                     xlabel="Power [dB]"):
    plt.hist(data, bins=200, range=(range_min, range_max), density=True,
             histtype="stepfilled")
    plt.xlabel(xlabel)
    plt.ylabel("Probability")
    plt.xticks(np.arange(range_min, range_max, step))
    Path(figure_path).parent.mkdir(parents=True, exist_ok=True)
    plt.savefig(str(figure_path))
    plt.close()


def extract_f0_and_npow(wavf):
    logging.info("Extract: %s", wavf)
    x, fs = read_wav(wavf)
    x = low_cut_filter(x, fs, cutoff=70)
    # wide search range for initialization (speaker range still unknown)
    f0 = world.f0_analyze(x, fs, shiftms=5.0, minf0=40.0, maxf0=700.0)
    spc = world.spectral_envelope(x, f0, fs, shiftms=5.0, fftl=1024)
    npow = world.spc2npow(spc)
    return {"f0": f0, "npow": npow}


def create_histograms(args, spkr):
    f0path = Path(args.figure_dir) / f"{spkr}_f0histogram.png"
    npowpath = Path(args.figure_dir) / f"{spkr}_npowhistogram.png"
    if f0path.exists() and npowpath.exists():
        return
    logging.info("Histogram generation for %s", spkr)
    files = sorted((Path(args.wav_dir) / spkr).glob("*.wav"))
    results = Parallel(n_jobs=args.n_jobs)(
        delayed(extract_f0_and_npow)(str(f)) for f in files
    )
    f0s = np.hstack([r["f0"] for r in results])
    npows = np.hstack([r["npow"] for r in results])
    create_histogram(f0s[f0s > 0], f0path, range_min=40, range_max=700,
                     step=50, xlabel="Fundamental frequency [Hz]")
    create_histogram(npows, npowpath, range_min=-70, range_max=20, step=10,
                     xlabel="Power [dB]")


def main():
    parser = argparse.ArgumentParser(
        description="Generate F0/power histograms per speaker"
    )
    parser.add_argument("--n_jobs", type=int, default=-1)
    parser.add_argument("--wav_dir", type=str)
    parser.add_argument("--figure_dir", type=str)
    args = parser.parse_args()
    spkrs = [s.name for s in sorted(Path(args.wav_dir).iterdir()) if s.is_dir()]
    for spkr in spkrs:
        create_histograms(args, spkr)


if __name__ == "__main__":
    main()
