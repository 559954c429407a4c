"""MCD evaluation CLI (reference: crank/bin/evaluate_mcd.py)."""

import argparse
import logging
import sys
from pathlib import Path

from joblib import Parallel, delayed

from crank_tpu.eval.mcd import get_world_mcep, mcd, summarize_pairwise
from crank_tpu.features.store import read_feature
from crank_tpu.utils import load_yaml, open_featsscp
from crank_tpu.utils.naming import parse_decoded_stem

logging.basicConfig(
    level=logging.INFO,
    stream=sys.stdout,
    format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
)


def calculate(cv_path, gt_file_list, conf, spkr_conf, from_wav=False):
    parsed = parse_decoded_stem(cv_path.stem)
    if parsed is None:
        raise ValueError(f"not a decoded-file stem: {cv_path}")
    number, orgspk, tarspk = parsed.uid, parsed.org, parsed.cv

    if conf["output_feat_type"] == "mcep" and not from_wav:
        cv_mcep = read_feature(cv_path, "feats")
        cv_f0 = read_feature(cv_path, "f0")
    else:
        cv_mcep, cv_f0 = get_world_mcep(cv_path, conf, spkr_conf[tarspk])

    gt_mcep = read_feature(gt_file_list[f"{tarspk}_{number}"], "mcep")
    gt_f0 = read_feature(gt_file_list[f"{tarspk}_{number}"], "f0")
    # tuple key: speaker names / uids may themselves contain '-' (JVS)
    return (orgspk, tarspk, number), mcd(cv_mcep, cv_f0, gt_mcep, gt_f0)


def main():
    parser = argparse.ArgumentParser(description="calculate MCD.")
    parser.add_argument("--conf", type=str)
    parser.add_argument("--spkr_conf", type=str)
    parser.add_argument("--featdir", type=str)
    parser.add_argument("--outwavdir", type=str)
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument("--n_jobs", default=1, type=int)
    parser.add_argument("--job_index", type=int, default=1,
                        help="1-based array-job index (utils/run.pl "
                             "JOB=1:N role)")
    parser.add_argument("--n_splits", type=int, default=1,
                        help="total number of array jobs; when >1, --out "
                             "receives tab-separated per-utterance scores "
                             "for a later --merge_from pass")
    parser.add_argument("--merge_from", type=str, nargs="*", default=None,
                        help="per-utterance score files from array jobs; "
                             "merge into pairwise means instead of "
                             "evaluating")
    parser.add_argument("--from_wav", action="store_true",
                        help="re-analyze synthesized wavs even for mcep "
                             "confs (instead of reading the decoded h5 "
                             "dumps directly) — used when stage 6 "
                             "vocoded the mcep dumps (--voc NPWG/PWG)")
    args = parser.parse_args()

    conf = load_yaml(args.conf)
    spkr_conf = load_yaml(args.spkr_conf)

    def write_lines(lines):
        # opened only once results exist — a failed or invalid run must
        # not truncate a previous good score file
        out = sys.stdout if args.out is None else open(args.out, "w")
        out.writelines(lines)
        if args.out is not None:
            out.close()

    if args.merge_from:
        results = []
        for part in args.merge_from:
            with open(part) as fp:
                for line in fp:
                    org, tar, number, v = line.rstrip("\n").split("\t")
                    results.append(((org, tar, number), float(v)))
        logging.info("merged %d per-utterance scores from %d jobs",
                     len(results), len(args.merge_from))
        write_lines(f"{k} {v:.3f}\n"
                    for k, v in summarize_pairwise(results).items())
        return

    if not (1 <= args.job_index <= args.n_splits):
        raise SystemExit(
            f"--job_index {args.job_index} outside 1..{args.n_splits}"
        )

    if conf["output_feat_type"] == "mcep" and not args.from_wav:
        # decoded dumps live under per-speaker subdirs (trainer layout);
        # the synthesized wav/ sibling holds no h5, so a recursive glob
        # over the dump root is unambiguous
        converted_files = sorted(Path(args.outwavdir).rglob("*.h5"))
    else:
        if args.from_wav:
            logging.info("--from_wav: re-analyzing synthesized wavs "
                         "instead of reading mcep dumps")
        converted_files = sorted(Path(args.outwavdir).rglob("*.wav"))
    if not converted_files:
        # exit non-zero BEFORE touching --out: a wrong --outwavdir or a
        # deleted dump dir must not truncate a previous good score file
        # and report success (run.py stage 7 checks the return code)
        raise SystemExit(
            f"no converted files found under {args.outwavdir} — "
            "nothing to evaluate"
        )
    converted_files = converted_files[args.job_index - 1::args.n_splits]
    logging.info("number of utterances = %d (job %d/%d)",
                 len(converted_files), args.job_index, args.n_splits)

    featdir = Path(args.featdir) / conf["feature"]["label"]
    gt_feats = open_featsscp(featdir / "eval" / "feats.scp")

    results = Parallel(n_jobs=args.n_jobs)(
        delayed(calculate)(cv, gt_feats, conf, spkr_conf, args.from_wav)
        for cv in converted_files
    )
    if args.n_splits > 1:
        # raw per-utterance scores (tab-separated: names/uids may contain
        # spaces never, but '-' yes — tabs are unambiguous)
        write_lines(f"{org}\t{tar}\t{number}\t{v}\n"
                    for (org, tar, number), v in results)
    else:
        write_lines(f"{k} {v:.3f}\n"
                    for k, v in summarize_pairwise(results).items())


if __name__ == "__main__":
    main()
