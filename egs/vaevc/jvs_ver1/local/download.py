#!/usr/bin/env python
"""Download the JVS corpus (Google Drive) into downloads/wav/jvsXXX/*.wav.

Same public Drive archive as the reference recipe (file id
19oAw8wWn3Y7z6CKChRdAyGOB9yupL_Xt); requires the ``gdown`` package for the
Drive download (large-file confirmation handling).
"""

import argparse
import shutil
import zipfile
from pathlib import Path

DRIVE_ID = "19oAw8wWn3Y7z6CKChRdAyGOB9yupL_Xt"


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
    zf_path = dl / "jvs_ver1.zip"
    if not zf_path.exists():
        try:
            import gdown
        except ImportError:
            raise SystemExit(
                "JVS lives on Google Drive; install gdown or download "
                f"https://drive.google.com/uc?id={DRIVE_ID} to {zf_path}"
            )
        gdown.download(id=DRIVE_ID, output=str(zf_path))
    with zipfile.ZipFile(zf_path) as zf:
        zf.extractall(dl)
    # collect parallel+nonpara wav24kHz under per-speaker dirs
    for spkdir in sorted((dl / "jvs_ver1").glob("jvs*")):
        tgt = wavdir / spkdir.name
        tgt.mkdir(exist_ok=True)
        for sub in ("parallel100", "nonpara30"):
            for w in (spkdir / sub / "wav24kHz16bit").glob("*.wav"):
                shutil.copy(w, tgt / f"{sub}_{w.name}")
    (dl / ".done").touch()


if __name__ == "__main__":
    main()
