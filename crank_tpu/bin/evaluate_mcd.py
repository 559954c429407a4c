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


def calculate(cv_path, gt_file_list, conf, spkr_conf):
    parsed = parse_decoded_stem(cv_path.stem)
    if parsed is None:
        raise ValueError(f"not a decoded-file stem: {cv_path}")
    number, orgspk, tarspk = parsed.uid, parsed.org, parsed.cv

    if conf["output_feat_type"] == "mcep":
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
    args = parser.parse_args()

    conf = load_yaml(args.conf)
    spkr_conf = load_yaml(args.spkr_conf)

    if conf["output_feat_type"] == "mcep":
        converted_files = sorted(Path(args.outwavdir).glob("*.h5"))
    else:
        converted_files = sorted(Path(args.outwavdir).rglob("*.wav"))
    logging.info("number of utterances = %d", len(converted_files))

    featdir = Path(args.featdir) / conf["feature"]["label"]
    gt_feats = open_featsscp(featdir / "eval" / "feats.scp")

    results = Parallel(n_jobs=args.n_jobs)(
        delayed(calculate)(cv, gt_feats, conf, spkr_conf)
        for cv in converted_files
    )
    out = sys.stdout if args.out is None else open(args.out, "w")
    for k, v in summarize_pairwise(results).items():
        out.write(f"{k} {v:.3f}\n")
    if args.out is not None:
        out.close()


if __name__ == "__main__":
    main()
