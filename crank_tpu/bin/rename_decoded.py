"""Sort vocoder-decoded wavs into per-original-speaker directories.

Role parity with the reference's rename step (crank/bin/rename_decoded.py):
decoded files are named ``<uid>_org-<orgspkr>_cv-<cvspkr>[_gen].wav`` and end
up as ``<orgspkr>/<uid>_org-<orgspkr>_cv-<cvspkr>.wav``. The stem is parsed
with an anchored regex, so utterance ids and speaker names containing
underscores (e.g. the JVS corpus) are handled; files that don't match the
contract are left in place with a warning instead of crashing the stage.
"""

import argparse
import logging
from pathlib import Path

from crank_tpu.utils.naming import format_decoded_stem, parse_decoded_stem

logging.basicConfig(level=logging.INFO)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--outwavdir", type=str)
    args = parser.parse_args()

    for wavf in sorted(Path(args.outwavdir).glob("*.wav")):
        parsed = parse_decoded_stem(wavf.stem)
        if parsed is None:
            logging.warning("unrecognized decoded stem, skipping: %s", wavf)
            continue
        dest_dir = wavf.parent / parsed.org
        dest_dir.mkdir(parents=True, exist_ok=True)
        stem = format_decoded_stem(parsed.uid, parsed.org, parsed.cv)
        wavf.rename(dest_dir / f"{stem}.wav")


if __name__ == "__main__":
    main()
