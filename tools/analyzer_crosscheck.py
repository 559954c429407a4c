#!/usr/bin/env python
"""Cross-check MCD between the first-party analyzer and WORLD (pyworld).

The in-tree analyzer (crank_tpu/native) is role-parity with WORLD, not
bit-identical, so MCD numbers computed with it carry an analyzer bias
relative to numbers published by the reference (which analyzes with
pyworld.harvest + cheaptrick and pysptk.sp2mc —
/root/reference/crank/bin/evaluate_mcd.py:45-79,
crank/feature/feature.py:75-107).  docs/ANALYZER_BIAS.md bounds the
analyzer against *analytic* ground truth; this tool measures the
*cross-framework* offset directly on real conversion outputs:

    for every (converted, ground-truth) wav pair it computes MCD twice —
    once with the native analyzer chain, once with pyworld/pysptk —
    using the SAME exact-DTW alignment code for both, so the only varying
    factor is the analyzer.  It prints per-pair means for both chains and
    the offset distribution (mean ± std, min/max per utterance).

pyworld/pysptk are NOT importable in the zero-egress build environment;
the tool exits with code 2 and a message there.  Run it on any machine
with `pip install pyworld pysptk` (and this repo) to produce the offset,
then record the bound in docs/ANALYZER_BIAS.md §cross-framework.

Usage (after a stage-6 decode of an eval set):
    python tools/analyzer_crosscheck.py \
        --conf conf/mlfb_vqvae.yml --spkr_conf conf/spkr.yml \
        --outwavdir exp/.../eval_wav --gt_wavdir downloads/wav \
        [--n_jobs 4] [--out crosscheck.txt]

Ground-truth wavs are matched by the decoded-stem contract
(utils/naming.py): a converted `<uid>_org-<o>_cv-<t>.wav` pairs with the
target speaker's original `<t>/<uid>.wav` (or `<t>_<uid>.wav`) under
--gt_wavdir.
"""

import argparse
import logging
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from crank_tpu.eval.mcd import get_world_mcep, mcd, summarize_pairwise
from crank_tpu.utils import load_yaml
from crank_tpu.utils.naming import parse_decoded_stem

logging.basicConfig(
    level=logging.INFO, stream=sys.stdout,
    format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
)


def find_gt_wav(gt_wavdir, tarspk, number):
    """Locate the target speaker's original utterance for a decoded stem."""
    gt_wavdir = Path(gt_wavdir)
    for cand in (
        gt_wavdir / tarspk / f"{number}.wav",
        gt_wavdir / f"{tarspk}_{number}.wav",
        gt_wavdir / tarspk / f"{tarspk}_{number}.wav",
    ):
        if cand.exists():
            return cand
    hits = [
        p for p in gt_wavdir.rglob(f"{number}.wav")
        if tarspk in p.parent.parts or p.parent.name == tarspk
    ]
    return hits[0] if hits else None


def get_pyworld_mcep(wavpath, conf, spkr_conf):
    """WORLD-chain re-analysis: the reference's evaluate_mcd feature path
    (pyworld.harvest -> cheaptrick -> pysptk.sp2mc), same pre-filter and
    parameters as the native chain in eval/mcd.get_world_mcep."""
    import pyworld
    import pysptk

    from crank_tpu.dsp.filters import low_cut_filter
    from crank_tpu.utils.audio_io import read_wav

    fc = conf["feature"]
    x, fs = read_wav(wavpath)
    x = np.asarray(x, dtype=np.float64)
    x = low_cut_filter(x, fs, cutoff=70)
    f0, t = pyworld.harvest(
        x, fs, f0_floor=spkr_conf["minf0"], f0_ceil=spkr_conf["maxf0"],
        frame_period=fc["shiftms"],
    )
    spc = pyworld.cheaptrick(x, f0, t, fs, fft_size=fc["fftl"])
    mcep = pysptk.sp2mc(spc, order=fc["mcep_dim"], alpha=fc["mcep_alpha"])
    return mcep, f0


def one_pair(cv_path, gt_path, conf, spkr_conf_tar):
    nat_cv = get_world_mcep(cv_path, conf, spkr_conf_tar)
    nat_gt = get_world_mcep(gt_path, conf, spkr_conf_tar)
    pw_cv = get_pyworld_mcep(cv_path, conf, spkr_conf_tar)
    pw_gt = get_pyworld_mcep(gt_path, conf, spkr_conf_tar)
    return mcd(*nat_cv, *nat_gt), mcd(*pw_cv, *pw_gt)


def main():
    parser = argparse.ArgumentParser(
        description="native-vs-pyworld analyzer MCD cross-check"
    )
    parser.add_argument("--conf", required=True)
    parser.add_argument("--spkr_conf", required=True)
    parser.add_argument("--outwavdir", required=True,
                        help="decoded/synthesized conversion wavs")
    parser.add_argument("--gt_wavdir", required=True,
                        help="original corpus wavs (per-speaker layout)")
    parser.add_argument("--n_jobs", type=int, default=1)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    try:
        import pyworld  # noqa: F401
        import pysptk  # noqa: F401
    except ImportError as e:
        print(
            f"pyworld/pysptk not importable ({e}).\n"
            "This cross-check needs the WORLD reference chain: run\n"
            "    pip install pyworld pysptk\n"
            "on a machine with egress, then re-run this tool there.",
            file=sys.stderr,
        )
        raise SystemExit(2)

    conf = load_yaml(args.conf)
    spkr_conf = load_yaml(args.spkr_conf)

    jobs = []
    for cv in sorted(Path(args.outwavdir).rglob("*.wav")):
        parsed = parse_decoded_stem(cv.stem)
        if parsed is None:
            continue
        gt = find_gt_wav(args.gt_wavdir, parsed.cv, parsed.uid)
        if gt is None:
            logging.warning("no ground-truth wav for %s (target %s uid %s)",
                            cv.name, parsed.cv, parsed.uid)
            continue
        jobs.append((cv, gt, (parsed.org, parsed.cv, parsed.uid)))
    if not jobs:
        raise SystemExit("no (converted, ground-truth) pairs found")
    logging.info("cross-checking %d utterance pairs", len(jobs))

    from joblib import Parallel, delayed

    scored = Parallel(n_jobs=args.n_jobs)(
        delayed(one_pair)(cv, gt, conf, spkr_conf[key[1]])
        for cv, gt, key in jobs
    )
    native = [(key, s[0]) for (_, _, key), s in zip(jobs, scored)]
    pw = [(key, s[1]) for (_, _, key), s in zip(jobs, scored)]
    deltas = np.asarray(
        [s[0] - s[1] for s in scored if np.isfinite(s[0] - s[1])]
    )

    lines = ["# pair-mean MCD [dB]: native | pyworld | offset\n"]
    nat_sum = summarize_pairwise(native)
    pw_sum = summarize_pairwise(pw)
    for k in nat_sum:
        lines.append(
            f"{k} {nat_sum[k]:.3f} {pw_sum[k]:.3f} "
            f"{nat_sum[k] - pw_sum[k]:+.3f}\n"
        )
    lines.append(
        f"# per-utterance offset (native - pyworld): "
        f"mean {deltas.mean():+.3f} dB, std {deltas.std():.3f}, "
        f"range [{deltas.min():+.3f}, {deltas.max():+.3f}] "
        f"over {len(deltas)} utts\n"
    )
    lines.append(
        "# record the mean ± std in docs/ANALYZER_BIAS.md "
        "§cross-framework\n"
    )
    out = sys.stdout if args.out is None else open(args.out, "w")
    out.writelines(lines)
    if args.out is not None:
        out.close()


if __name__ == "__main__":
    main()
