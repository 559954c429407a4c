"""Batch mel->wav Griffin-Lim CLI (reference: crank/bin/griffin_lim.py).

Synthesis runs as a fused XLA loop on the accelerator; utterances are
processed sequentially with frame-count bucketing to bound compilation.
"""

import argparse
import logging
import sys
from pathlib import Path

from crank_tpu.dsp.gl import mlfb_to_wav
from crank_tpu.features.store import read_feature
from crank_tpu.utils import load_yaml
from crank_tpu.utils.audio_io import write_wav

logging.basicConfig(level=logging.INFO, stream=sys.stdout)


def main():
    parser = argparse.ArgumentParser(
        description="Convert filter banks to waveform using Griffin-Lim"
    )
    parser.add_argument("--n_jobs", type=int, default=1)
    parser.add_argument("--conf", type=str, required=True)
    parser.add_argument("--rootdir", type=str)
    parser.add_argument("--outdir", type=str)
    args = parser.parse_args()

    conf = load_yaml(args.conf)
    fc = conf["feature"]
    outdir = Path(args.outdir)
    rootdir = Path(args.rootdir)
    outdir.mkdir(parents=True, exist_ok=True)
    # rglob: decoded features are nested per original speaker
    for h5f in sorted(rootdir.rglob("*.h5")):
        mlfb = read_feature(h5f, "feats")
        wav = mlfb_to_wav(
            mlfb, fs=fc["fs"], n_mels=fc["mlfb_dim"], n_fft=fc["fftl"],
            win_length=fc.get("win_length", fc["fftl"]),
            hop_size=fc["hop_size"], fmin=fc["fmin"], fmax=fc["fmax"],
            n_iters=fc["n_iteration"],
        )
        rel = h5f.relative_to(rootdir).parent
        (outdir / rel).mkdir(parents=True, exist_ok=True)
        write_wav(outdir / rel / (h5f.stem + ".wav"), wav, fc["fs"])
        logging.info("wrote %s", outdir / rel / (h5f.stem + ".wav"))


if __name__ == "__main__":
    main()
