"""Batch mel->wav Griffin-Lim CLI (reference: crank/bin/griffin_lim.py).

Synthesis runs as a fused XLA loop on the accelerator.  Utterances are
bucketed by padded frame count and synthesized in batches — one compile per
bucket, many utterances per device call (the reference runs librosa
per-utterance on CPU workers).
"""

import argparse
import logging
import sys
from pathlib import Path

import numpy as np

from crank_tpu.features.store import read_feature
from crank_tpu.utils import load_yaml
from crank_tpu.utils.audio_io import write_wav

logging.basicConfig(level=logging.INFO, stream=sys.stdout)

BUCKET = 128
MAX_BATCH = 8


def main():
    parser = argparse.ArgumentParser(
        description="Convert filter banks to waveform using Griffin-Lim"
    )
    parser.add_argument("--n_jobs", type=int, default=1)
    parser.add_argument("--conf", type=str, required=True)
    parser.add_argument("--rootdir", type=str)
    parser.add_argument("--outdir", type=str)
    args = parser.parse_args()

    from crank_tpu.dsp.gl import griffin_lim
    from crank_tpu.dsp.mel import mel_pseudo_inverse

    conf = load_yaml(args.conf)
    fc = conf["feature"]
    outdir = Path(args.outdir)
    rootdir = Path(args.rootdir)
    outdir.mkdir(parents=True, exist_ok=True)

    inv_basis = mel_pseudo_inverse(
        fc["fs"], fc["fftl"], fc["mlfb_dim"], fc["fmin"], fc["fmax"]
    )

    # rglob: decoded features are nested per original speaker
    items = []
    for h5f in sorted(rootdir.rglob("*.h5")):
        mlfb = read_feature(h5f, "feats")
        spc = np.power(10.0, mlfb) @ inv_basis.T
        t_pad = -(-max(spc.shape[0], 2) // BUCKET) * BUCKET
        items.append((h5f, spc, t_pad))

    # bucket by padded length, synthesize in batches
    items.sort(key=lambda it: it[2])
    i = 0
    while i < len(items):
        t_pad = items[i][2]
        group = [it for it in items[i : i + MAX_BATCH] if it[2] == t_pad]
        i += len(group)
        spcs = np.stack(
            [np.pad(np.abs(s), ((0, t_pad - s.shape[0]), (0, 0)))
             for _, s, _ in group]
        )
        wavs = griffin_lim(
            spcs, n_fft=fc["fftl"], hop_size=fc["hop_size"],
            win_length=fc.get("win_length", fc["fftl"]),
            n_iters=fc["n_iteration"],
        )
        for (h5f, spc, _), wav in zip(group, wavs):
            rel = h5f.relative_to(rootdir).parent
            (outdir / rel).mkdir(parents=True, exist_ok=True)
            out = outdir / rel / (h5f.stem + ".wav")
            write_wav(out, np.asarray(wav)[: fc["hop_size"] * (spc.shape[0] - 1)],
                      fc["fs"])
            logging.info("wrote %s", out)


if __name__ == "__main__":
    main()
