"""Batch WORLD synthesis CLI for mcep recipes (stage 6).

Synthesizes decoded [mcep(+0th), f0, cap] h5 dumps
(trainer._store_features keys) to waveforms with the first-party native
WORLD-role synthesizer (native/world.py world2wav) — the role the
reference fills per-utterance at decode time via sprocket's Synthesizer
(crank/net/trainer/basetrainer.py:419-437, crank/utils/utils.py:150-171).
When the dump carries ``rmcep`` (the org speaker's mel-cepstrum), the
decoded envelope's power is corrected against it (``mod_power``), the
same quality knob the reference applies before synthesis
(crank/utils/utils.py:154-166).
"""

import argparse
import logging
import sys
from pathlib import Path

from joblib import Parallel, delayed

from crank_tpu.features.store import read_feature
from crank_tpu.utils import load_yaml
from crank_tpu.utils.audio_io import write_wav

logging.basicConfig(level=logging.INFO, stream=sys.stdout)


def synthesize(h5f, rootdir, outdir, fc):
    from crank_tpu.native import world

    feat = {
        "feats": read_feature(h5f, "feats"),
        "f0": read_feature(h5f, "f0"),
        "cap": read_feature(h5f, "cap"),
    }
    try:
        feat["rmcep"] = read_feature(h5f, "rmcep")
    except (KeyError, OSError):
        pass
    wav = world.mcep_dump_to_wav(feat, fc)
    wavf = Path(outdir) / Path(h5f).relative_to(rootdir).with_suffix(".wav")
    wavf.parent.mkdir(parents=True, exist_ok=True)
    write_wav(wavf, wav, fc["fs"])
    logging.info("wrote %s", wavf)


def main():
    parser = argparse.ArgumentParser(
        description="WORLD synthesis of decoded mcep features"
    )
    parser.add_argument("--n_jobs", type=int, default=1)
    parser.add_argument("--conf", type=str, required=True)
    parser.add_argument("--rootdir", type=str, required=True)
    parser.add_argument("--outdir", type=str, required=True)
    args = parser.parse_args()

    conf = load_yaml(args.conf)
    fc = conf["feature"]
    rootdir = Path(args.rootdir)
    h5s = sorted(rootdir.rglob("*.h5"))
    logging.info("number of utterances = %d", len(h5s))
    Parallel(n_jobs=args.n_jobs)(
        delayed(synthesize)(h5f, rootdir, args.outdir, fc) for h5f in h5s
    )


if __name__ == "__main__":
    main()
