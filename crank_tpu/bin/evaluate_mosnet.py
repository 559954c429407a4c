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

    # audio reads overlap device inference via a bounded thread prefetch
    # (n_jobs readers); peak memory stays at ~n_jobs files instead of the
    # whole converted eval set
    from concurrent.futures import ThreadPoolExecutor

    n_readers = max(1, args.n_jobs if args.n_jobs > 0 else 4)
    pairwise = {}
    with ThreadPoolExecutor(max_workers=n_readers) as pool:
        import collections

        queue = collections.deque()
        files = iter(converted_files)

        def enqueue():
            f = next(files, None)
            if f is not None:
                queue.append((f, pool.submit(read_wav, f)))

        for _ in range(2 * n_readers):
            enqueue()
        while queue:
            f, fut = queue.popleft()
            x, fs = fut.result()
            enqueue()
            parsed = parse_decoded_stem(f.stem)
            if parsed is None:
                logging.warning("unrecognized decoded stem, skipping: %s", f)
                continue
            score = predictor.predict_wav(x, fs)
            pairwise.setdefault(
                f"{parsed.org} {parsed.cv}", []
            ).append(score)

    out = sys.stdout if args.out is None else open(args.out, "w")
    for k in sorted(pairwise):
        out.write(f"{k} {float(np.mean(pairwise[k])):.4f}\n")
    if args.out is not None:
        out.close()


if __name__ == "__main__":
    main()
