"""Aggregate stage-7 logs into a RESULTS.md table.

Role parity with utils/generate_results.sh + pack_results.sh in the
reference: averages mcd.log / mosnet.log per experiment and emits markdown;
--pack additionally tars the model/checkpoints/logs for publication.
"""

import argparse
import tarfile
from pathlib import Path

import numpy as np


def summarize(logf):
    vals = []
    for line in Path(logf).read_text().splitlines():
        parts = line.split()
        if len(parts) >= 3:
            org, tar, v = parts[0], parts[1], float(parts[-1])
            if org != tar:  # mean over non-self pairs (reference convention)
                vals.append(v)
    return float(np.mean(vals)) if vals else float("nan")


def main():
    parser = argparse.ArgumentParser(description="Generate RESULTS.md")
    parser.add_argument("--expdir", type=str, required=True)
    parser.add_argument("--out", type=str, default="RESULTS.md")
    parser.add_argument("--pack", action="store_true")
    args = parser.parse_args()

    expdir = Path(args.expdir)
    lines = []
    for mcd_log in sorted(expdir.rglob("mcd.log")):
        outdir = mcd_log.parent
        conf = outdir.parents[1].name
        row = [f"# {conf} ({outdir.parent.name}/{outdir.name})"]
        row.append(f"MCD: {summarize(mcd_log):.5f}")
        mosnet_log = outdir / "mosnet.log"
        if mosnet_log.exists():
            row.append(f"MOSnet: {summarize(mosnet_log):.5f}")
        lines.append("\n".join(row))
    Path(args.out).write_text("\n\n".join(lines) + "\n")
    print(f"wrote {args.out}")

    if args.pack:
        tarf = expdir.parent / "results.tar.gz"
        with tarfile.open(tarf, "w:gz") as tf:
            for pat in ("checkpoint_*steps.pkl", "*.log", "RESULTS.md"):
                for f in expdir.rglob(pat):
                    tf.add(f, arcname=f.relative_to(expdir.parent))
        print(f"packed {tarf}")


if __name__ == "__main__":
    main()
