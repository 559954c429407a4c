"""Offline acoustic feature extraction for one recipe phase.

Role parity with the reference's stage-2 extraction CLI
(crank/bin/extract_feature.py): reads the phase's scp, writes one h5 of
features per utterance under ``<featdir>/<label>/<phase>/<spkr>/`` plus a
``feats.scp`` index, and synthesizes Griffin-Lim / analysis-synthesis check
wavs for the first ``n_decode_samples`` utterances of every speaker.

Structure differs from the reference deliberately: a flat per-utterance
worklist (uid, wav, extractor, synth?) is assembled up front — feats.scp is
derived from that list in one shot — and a single joblib pool drains the
whole list, so one slow speaker cannot serialize the tail of the run.
"""

import argparse
import logging
from pathlib import Path

from joblib import Parallel, delayed

from crank_tpu.features.extractor import FeatureExtractor
from crank_tpu.utils import load_yaml, open_scpdir

logging.basicConfig(level=logging.INFO)


def build_worklist(scp, featdir, feat_conf, spkr_conf, n_decode):
    """[(uid, wav path, FeatureExtractor, synth flag)] over all speakers."""
    work = []
    for spkr in scp["spkrs"]:
        spkr_dir = featdir / spkr
        spkr_dir.mkdir(parents=True, exist_ok=True)
        extractor = FeatureExtractor(spkr_dir, feat_conf, spkr_conf[spkr])
        for i, uid in enumerate(scp["spk2utt"][spkr]):
            work.append((uid, scp["wav"][uid], extractor, i < n_decode))
    return work


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--n_jobs", type=int, default=-1)
    parser.add_argument("--phase", type=str, default=None)
    parser.add_argument("--n_decode_samples", type=int, default=3)
    parser.add_argument("--conf", type=str)
    parser.add_argument("--spkr_yml", type=str)
    parser.add_argument("--scpdir", type=str)
    parser.add_argument("--featdir", type=str)
    args = parser.parse_args()

    conf = load_yaml(args.conf)
    scp = open_scpdir(Path(args.scpdir) / args.phase)
    featdir = Path(args.featdir) / conf["feature"]["label"] / args.phase
    work = build_worklist(scp, featdir, conf["feature"],
                          load_yaml(args.spkr_yml), args.n_decode_samples)

    index_lines = [
        f"{uid} {featdir / scp['utt2spk'][uid] / (Path(wavf).stem + '.h5')}\n"
        for uid, wavf, _, _ in work
    ]
    with open(featdir / "feats.scp", "w") as fp:
        fp.writelines(index_lines)

    logging.info("extracting %d utterances (%s)", len(work), args.phase)
    Parallel(n_jobs=args.n_jobs)(
        delayed(ex.analyze)(wavf, synth_flag=synth)
        for _, wavf, ex, synth in work
    )


if __name__ == "__main__":
    main()
