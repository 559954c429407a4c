"""Statistics stage CLI (reference: crank/bin/extract_statistics.py).

Fits global scalers for mlfb/lcf0/mcep (+per-window-type mlfb) and
per-speaker lcf0 scalers; dumps scaler.pkl.
"""

import argparse
import logging
from pathlib import Path

from crank_tpu.features.scaler import fit_scalers, save_scaler
from crank_tpu.utils import load_yaml, open_featsscp, open_scpdir

logging.basicConfig(level=logging.INFO)


def main():
    parser = argparse.ArgumentParser(description="Extract feature statistics")
    parser.add_argument("--n_jobs", type=int, default=-1)
    parser.add_argument("--phase", type=str, default="train")
    parser.add_argument("--conf", type=str)
    parser.add_argument("--scpdir", type=str)
    parser.add_argument("--featdir", type=str)
    args = parser.parse_args()

    conf = load_yaml(args.conf)
    scp = open_scpdir(Path(args.scpdir) / args.phase)
    featdir = Path(args.featdir) / conf["feature"]["label"]
    featsscp = open_featsscp(featdir / args.phase / "feats.scp")

    scaler = fit_scalers(
        list(featsscp.values()), conf, spk2utt=scp["spk2utt"], featsscp=featsscp
    )
    for k, v in scaler.items():
        if hasattr(v, "n_samples_seen_"):
            logging.info("# of samples for %s: %s", k, v.n_samples_seen_)

    pklf = featdir / "scaler.pkl"
    save_scaler(scaler, pklf)
    logging.info("Save scaler to %s", pklf)


if __name__ == "__main__":
    main()
