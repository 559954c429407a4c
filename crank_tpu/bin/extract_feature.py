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
    parser.add_argument("--job_index", type=int, default=1,
                        help="1-based array-job index (utils/run.pl "
                             "JOB=1:N role): this process extracts every "
                             "n_splits-th utterance starting at job_index")
    parser.add_argument("--n_splits", type=int, default=1,
                        help="total number of array jobs")
    args = parser.parse_args()
    if not (1 <= args.job_index <= args.n_splits):
        raise SystemExit(
            f"--job_index {args.job_index} outside 1..{args.n_splits}"
        )

    conf = load_yaml(args.conf)
    scp = open_scpdir(Path(args.scpdir) / args.phase)
    featdir = Path(args.featdir) / conf["feature"]["label"] / args.phase
    work = build_worklist(scp, featdir, conf["feature"],
                          load_yaml(args.spkr_yml), args.n_decode_samples)

    # feats.scp covers the FULL phase and is derived from the scp alone,
    # so only the first array job writes it (identical for any split)
    if args.job_index == 1:
        index_lines = [
            f"{uid} "
            f"{featdir / scp['utt2spk'][uid] / (Path(wavf).stem + '.h5')}\n"
            for uid, wavf, _, _ in work
        ]
        with open(featdir / "feats.scp", "w") as fp:
            fp.writelines(index_lines)

    shard = work[args.job_index - 1::args.n_splits]
    logging.info("extracting %d/%d utterances (%s, job %d/%d)",
                 len(shard), len(work), args.phase, args.job_index,
                 args.n_splits)
    Parallel(n_jobs=args.n_jobs)(
        delayed(ex.analyze)(wavf, synth_flag=synth)
        for _, wavf, ex, synth in shard
    )


if __name__ == "__main__":
    main()
