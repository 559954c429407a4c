"""Re-organize vocoder-decoded wavs into per-original-speaker directories
(reference: crank/bin/rename_decoded.py), parsing org-X_cv-Y stems."""

import argparse
from pathlib import Path


def main():
    parser = argparse.ArgumentParser(description="Rename decoded waveforms")
    parser.add_argument("--outwavdir", type=str)
    args = parser.parse_args()
    for f in Path(args.outwavdir).glob("*.wav"):
        stem = str(f.stem)
        if stem.endswith("_gen"):
            stem = stem[: -len("_gen")]
        org = stem.split("org")[1].split("cv")[0].lstrip("-").rstrip("_")
        (f.parent / org).mkdir(exist_ok=True, parents=True)
        f.rename(f.parent / org / (stem + ".wav"))


if __name__ == "__main__":
    main()
