"""MOSnet evaluation CLI (reference: crank/bin/evaluate_mosnet.py).

Predicted MOS per converted wav, aggregated per speaker pair.  Requires a
converted MOSNet checkpoint (--weights); see crank_tpu/eval/mosnet.py.
"""

import argparse
import logging
import sys
from pathlib import Path

import numpy as np

from crank_tpu.eval.mosnet import MOSNetPredictor
from crank_tpu.utils.audio_io import read_wav
from crank_tpu.utils.naming import parse_decoded_stem

logging.basicConfig(level=logging.INFO, stream=sys.stdout)


def main():
    parser = argparse.ArgumentParser(description="calculate MOSnet scores.")
    parser.add_argument("--outwavdir", type=str)
    parser.add_argument("--weights", type=str, default=None)
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument("--n_jobs", default=1, type=int)
    args = parser.parse_args()

    predictor = MOSNetPredictor(weights=args.weights)
    converted_files = sorted(Path(args.outwavdir).rglob("*.wav"))
    logging.info("number of utterances = %d", len(converted_files))

    # audio reading/feature prep overlaps device inference via a thread pool
    # (n_jobs parity with the reference CLI; inference itself is one device)
    from joblib import Parallel, delayed

    loaded = Parallel(n_jobs=args.n_jobs, prefer="threads")(
        delayed(read_wav)(f) for f in converted_files
    )
    pairwise = {}
    for f, (x, fs) in zip(converted_files, loaded):
        parsed = parse_decoded_stem(f.stem)
        if parsed is None:
            logging.warning("unrecognized decoded stem, skipping: %s", f)
            continue
        score = predictor.predict_wav(x, fs)
        pairwise.setdefault(f"{parsed.org} {parsed.cv}", []).append(score)

    out = sys.stdout if args.out is None else open(args.out, "w")
    for k in sorted(pairwise):
        out.write(f"{k} {float(np.mean(pairwise[k])):.4f}\n")
    if args.out is not None:
        out.close()


if __name__ == "__main__":
    main()
