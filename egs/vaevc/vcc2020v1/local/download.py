#!/usr/bin/env python
"""VCC2020 corpus placement helper.

The VCC2020 corpus is distributed under a participant agreement and has no
public auto-download (the reference recipe's local/download.sh is likewise a
stub).  Place the wav files as downloads/wav/{SEF1,...,TMM1}/*.wav.
"""

import argparse
from pathlib import Path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--downloaddir", type=Path, required=True)
    args = parser.parse_args()
    wavdir = args.downloaddir / "wav"
    wavdir.mkdir(parents=True, exist_ok=True)
    spkrs = sorted(d.name for d in wavdir.iterdir() if d.is_dir())
    if spkrs:
        print("found speakers:", " ".join(spkrs))
    else:
        print(
            "VCC2020 has no public auto-download. Put the corpus at "
            f"{wavdir}/{{SEF1,SEF2,SEM1,SEM2,TEF1,TEF2,TEM1,TEM2,...}}/*.wav"
        )


if __name__ == "__main__":
    main()
