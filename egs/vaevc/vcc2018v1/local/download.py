#!/usr/bin/env python
"""Download the VCC2018 corpus into downloads/wav/<SPKR>/*.wav.

Role parity with the reference recipe's local/download.sh (same public
Edinburgh DataShare archives); pure-Python stdlib implementation.
"""

import argparse
import shutil
import urllib.request
import zipfile
from pathlib import Path

BASE = "https://datashare.is.ed.ac.uk/bitstream/handle/10283/3061"
ARCHIVES = [
    "vcc2018_database_training.zip",
    "vcc2018_database_evaluation.zip",
    "vcc2018_database_reference.zip",
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--downloaddir", type=Path, required=True)
    args = parser.parse_args()
    dl = args.downloaddir
    wavdir = dl / "wav"
    wavdir.mkdir(parents=True, exist_ok=True)
    if (dl / ".done").exists():
        print("already finished. skipped download.")
        return
    for name in ARCHIVES:
        dst = dl / name
        if not dst.exists():
            print("downloading", name)
            urllib.request.urlretrieve(f"{BASE}/{name}", dst)
        with zipfile.ZipFile(dst) as zf:
            zf.extractall(dl)
    for sub in ("vcc2018_training", "vcc2018_evaluation", "vcc2018_reference"):
        for spkdir in sorted((dl / sub).glob("VCC2*")):
            tgt = wavdir / spkdir.name.replace("VCC2", "")
            tgt.mkdir(exist_ok=True)
            for w in spkdir.glob("*.wav"):
                shutil.copy(w, tgt / w.name)
    for name in ARCHIVES:
        (dl / name).unlink(missing_ok=True)
    for sub in ("vcc2018_training", "vcc2018_evaluation", "vcc2018_reference"):
        shutil.rmtree(dl / sub, ignore_errors=True)
    (dl / ".done").touch()


if __name__ == "__main__":
    main()
