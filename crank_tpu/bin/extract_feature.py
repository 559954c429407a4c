"""Feature-extraction stage CLI (reference: crank/bin/extract_feature.py).

Per-speaker parallel extraction of acoustic features into per-utterance h5
files; writes feats.scp; the first n_decode_samples utterances per speaker
also get Griffin-Lim / analysis-synthesis check wavs.
"""

import argparse
import logging
from pathlib import Path

from joblib import Parallel, delayed

from crank_tpu.features.extractor import FeatureExtractor
from crank_tpu.utils import load_yaml, open_scpdir

logging.basicConfig(level=logging.INFO)


def main():
    parser = argparse.ArgumentParser(description="Extract acoustic features")
    parser.add_argument("--n_jobs", type=int, default=-1)
    parser.add_argument("--phase", type=str, default=None)
    parser.add_argument("--n_decode_samples", type=int, default=3)
    parser.add_argument("--conf", type=str)
    parser.add_argument("--spkr_yml", type=str)
    parser.add_argument("--scpdir", type=str)
    parser.add_argument("--featdir", type=str)
    args = parser.parse_args()

    conf = load_yaml(args.conf)
    spkr_conf = load_yaml(args.spkr_yml)
    scp = open_scpdir(Path(args.scpdir) / args.phase)

    featdir = Path(args.featdir) / conf["feature"]["label"] / args.phase
    featsscp = featdir / "feats.scp"
    if featsscp.exists():
        featsscp.unlink()

    for spkr in scp["spkrs"]:
        logging.info("extract feature for %s", spkr)
        wavs = [scp["wav"][uid] for uid in scp["spk2utt"][spkr]]
        (featdir / spkr).mkdir(parents=True, exist_ok=True)
        feat = FeatureExtractor(featdir / spkr, conf["feature"], spkr_conf[spkr])

        featsscp.parent.mkdir(parents=True, exist_ok=True)
        with open(featsscp, "a") as fp:
            for uid in scp["spk2utt"][spkr]:
                wavf = scp["wav"][uid]
                h5f = str(featdir / spkr / (Path(wavf).stem + ".h5"))
                fp.write(f"{uid} {h5f}\n")

        Parallel(n_jobs=args.n_jobs)(
            delayed(feat.analyze)(wavf, synth_flag=True)
            for wavf in wavs[: args.n_decode_samples]
        )
        Parallel(n_jobs=args.n_jobs)(
            delayed(feat.analyze)(wavf, synth_flag=False)
            for wavf in wavs[args.n_decode_samples :]
        )


if __name__ == "__main__":
    main()
