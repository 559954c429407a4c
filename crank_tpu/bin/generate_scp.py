"""Generate Kaldi-style scp splits from a speaker-per-directory wav tree.

Role parity with the reference's scp stage (crank/bin/generate_scp.py): same
split policy and on-disk format (wav.scp / utt2spk / spk2utt per split,
uid = "<spkr>_<stem>"), and the same auto-created default spkr.yml
(minf0=40, maxf0=700, npow=-20) that stage 1's histograms then inform.

The split policy, as a contract:

* with dedicated ``--eval_speakers``: those speakers contribute all of their
  utterances to eval; every other speaker is split train/dev by the last
  ``dev_utterances``.
* otherwise each speaker is split from the tail: eval takes the last
  ``eval_utterances``, dev the ``dev_utterances`` before those. A zero count
  aliases that split to its neighbor (dev==eval when one of them is 0), and
  dev==eval==0 is refused.
"""

import argparse
import logging
import random
import sys
from pathlib import Path

import yaml

from crank_tpu.utils.scp import write_scp

logging.basicConfig(level=logging.INFO, stream=sys.stdout)


def split_plan(n, n_dev, n_eval, dedicated_eval):
    """Return {split: slice} over a speaker's sorted utterance list.

    ``dedicated_eval``: None when no --eval_speakers are in play, else a bool
    saying whether THIS speaker is one of the dedicated eval speakers.
    """
    if dedicated_eval is not None:
        if dedicated_eval:
            return {"eval": slice(None)}
        return {"train": slice(0, n - n_dev), "dev": slice(n - n_dev, n)}

    if n_dev == 0 and n_eval == 0:
        raise ValueError(
            "dev_utterances and eval_utterances cannot both be zero"
        )
    if n_eval == 0:
        tail = slice(n - n_dev, n)
        return {"train": slice(0, n - n_dev), "dev": tail, "eval": tail}
    if n_dev == 0:
        head = slice(0, n - n_eval)
        return {"train": head, "dev": head, "eval": slice(n - n_eval, n)}
    return {
        "train": slice(0, n - n_dev - n_eval),
        "dev": slice(n - n_dev - n_eval, n - n_eval),
        "eval": slice(n - n_eval, n),
    }


def default_spkr_yml(path, spkrs):
    """Wide-open F0/power ranges; stage 1 histograms guide manual tuning."""
    with open(path, "w") as fp:
        yaml.dump(
            {s: {"minf0": 40, "maxf0": 700, "npow": -20} for s in spkrs}, fp
        )


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--shuffle", default=False, action="store_true")
    parser.add_argument("--wavdir", type=str)
    parser.add_argument("--scpdir", type=str)
    parser.add_argument("--spkr_yml", type=str)
    parser.add_argument("--dev_utterances", type=int, default=5)
    parser.add_argument("--eval_utterances", type=int, default=0)
    parser.add_argument("--eval_speakers", type=str, nargs="*", default=[""])
    args = parser.parse_args()

    wavdir = Path(args.wavdir)
    spkrs = sorted(d.name for d in wavdir.iterdir() if d.is_dir())
    assert len(spkrs) > 2, f"Need >2 speaker directories in {wavdir}"
    if not Path(args.spkr_yml).exists():
        default_spkr_yml(args.spkr_yml, spkrs)

    scpdir = Path(args.scpdir)
    if scpdir.exists():
        logging.info("scp directory already exists: %s", scpdir)
        return

    eval_spkrs = {s for s in args.eval_speakers if s}
    for spkr in spkrs:
        wavfs = sorted((wavdir / spkr).glob("**/*.wav"))
        if args.shuffle:
            wavfs = random.sample(wavfs, len(wavfs))
        dedicated = (spkr in eval_spkrs) if eval_spkrs else None
        plan = split_plan(len(wavfs), args.dev_utterances,
                          args.eval_utterances, dedicated)
        for split, sl in plan.items():
            write_scp(scpdir / split, spkr, wavfs[sl])


if __name__ == "__main__":
    main()
