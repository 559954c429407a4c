"""Generate Kaldi-style scp files (reference: crank/bin/generate_scp.py).

Builds wav.scp/utt2spk/spk2utt train/dev/eval splits from a
speaker-per-directory wav tree and auto-creates a default spkr.yml
(minf0=40, maxf0=700, npow=-20).
"""

import argparse
import logging
import random
import sys
from pathlib import Path

import yaml

from crank_tpu.utils.scp import write_scp

logging.basicConfig(level=logging.INFO, stream=sys.stdout)


def create_spkr_yml(path, spkrs):
    spkr_yml = {s: {"minf0": 40, "maxf0": 700, "npow": -20} for s in spkrs}
    with open(path, "w") as fp:
        yaml.dump(spkr_yml, fp)


def main():
    parser = argparse.ArgumentParser(description="generate scp and spkr files")
    parser.add_argument("--shuffle", default=False, action="store_true")
    parser.add_argument("--wavdir", type=str)
    parser.add_argument("--scpdir", type=str)
    parser.add_argument("--spkr_yml", type=str)
    parser.add_argument("--dev_utterances", type=int, default=5)
    parser.add_argument("--eval_utterances", type=int, default=0)
    parser.add_argument("--eval_speakers", type=str, nargs="*", default=[""])
    args = parser.parse_args()

    spkrs = [s.name for s in sorted(Path(args.wavdir).iterdir()) if s.is_dir()]
    assert len(spkrs) > 2, f"Need >2 speaker directories in {args.wavdir}"
    if not Path(args.spkr_yml).exists():
        create_spkr_yml(args.spkr_yml, spkrs)

    scpdir = Path(args.scpdir)
    n_dev, n_eval = args.dev_utterances, args.eval_utterances
    if scpdir.exists():
        logging.info("scp directory already exists: %s", args.scpdir)
        return

    for spkr in spkrs:
        wavfs = sorted((Path(args.wavdir) / spkr).glob("**/*.wav"))
        if args.shuffle:
            wavfs = random.sample(wavfs, len(wavfs))
        if args.eval_speakers[0] == "":
            if n_eval == 0:
                if n_dev == 0:
                    raise ValueError("You need to make non-zero either dev or eval.")
                write_scp(scpdir / "train", spkr, wavfs[:-n_dev])
                write_scp(scpdir / "dev", spkr, wavfs[-n_dev:])
                write_scp(scpdir / "eval", spkr, wavfs[-n_dev:])
            elif n_dev != 0:
                de = n_dev + n_eval
                write_scp(scpdir / "train", spkr, wavfs[:-de])
                write_scp(scpdir / "dev", spkr, wavfs[-de : -de + n_dev])
                write_scp(scpdir / "eval", spkr, wavfs[-n_eval:])
            else:
                write_scp(scpdir / "train", spkr, wavfs[:-n_eval])
                write_scp(scpdir / "dev", spkr, wavfs[:-n_eval])
                write_scp(scpdir / "eval", spkr, wavfs[-n_eval:])
        else:
            if spkr not in args.eval_speakers:
                write_scp(scpdir / "train", spkr, wavfs[:-n_dev])
                write_scp(scpdir / "dev", spkr, wavfs[-n_dev:])
            else:
                write_scp(scpdir / "eval", spkr, wavfs)


if __name__ == "__main__":
    main()
