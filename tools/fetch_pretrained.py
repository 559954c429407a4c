#!/usr/bin/env python3
"""Fetch pretrained artifacts (external PWG vocoder checkpoints, MOSNet
weights) into a recipe's downloads directory.

First-party replacement for the reference's gdown-based shell tooling
(utils/download_from_google_drive.sh, local/download_pretrained_vocoder.sh):
pure-stdlib Google Drive download (including the large-file confirm-token
cookie exchange), plain-URL download, tar.gz/zip extraction and a ``.done``
stamp so recipe stages are idempotent.

Usage:
    python tools/fetch_pretrained.py --preset PWG --outdir downloads/PWG
    python tools/fetch_pretrained.py --gdrive_id <id> --outdir downloads/X
    python tools/fetch_pretrained.py --url https://... --outdir downloads/Y

Offline environments get a clear actionable error instead of a stack trace.
"""

import argparse
import re
import shutil
import sys
import tarfile
import tempfile
import urllib.error
import urllib.request
import zipfile
from http.cookiejar import CookieJar
from pathlib import Path

# preset -> (kind, locator) — ids published by the upstream recipes
PRESETS = {
    # vcc2018/vcc2020 fine-tunable PWG checkpoint bundle
    "PWG": ("gdrive", "1N9xqzRte6SGP6ZpPNS7uug8uCkM-sCeB"),
    # published MOSNet CNN-BLSTM Keras checkpoint (convert with
    # tools/convert_mosnet.py)
    "MOSNET": ("url", "https://github.com/lochenchou/MOSNet/raw/master/"
                      "pre_trained/CNN-BLSTM.h5"),
}

GDRIVE_URL = "https://drive.google.com/uc?export=download&id={id}"


def _opener():
    return urllib.request.build_opener(
        urllib.request.HTTPCookieProcessor(CookieJar())
    )


def download_gdrive(file_id, dest: Path):
    """Google Drive download incl. the 'can't scan for viruses' confirm
    token round-trip for large files."""
    opener = _opener()
    url = GDRIVE_URL.format(id=file_id)
    with opener.open(url) as resp:
        data = resp.read()
    if b"confirm=" in data or b"download-form" in data:
        m = re.search(rb"confirm=([0-9A-Za-z_-]+)", data)
        token = m.group(1).decode() if m else "t"
        url = f"{GDRIVE_URL.format(id=file_id)}&confirm={token}"
        with opener.open(url) as resp:
            data = resp.read()
    dest.write_bytes(data)


def download_url(url, dest: Path):
    with urllib.request.urlopen(url) as resp, open(dest, "wb") as fp:
        shutil.copyfileobj(resp, fp)


def extract(archive: Path, outdir: Path):
    name = archive.name
    if name.endswith((".tar.gz", ".tgz", ".tar")):
        with tarfile.open(archive) as tf:
            tf.extractall(outdir, filter="data")
    elif name.endswith(".zip"):
        with zipfile.ZipFile(archive) as zf:
            zf.extractall(outdir)
    else:  # single file: keep under a stable name
        shutil.move(str(archive), outdir / f"artifact{archive.suffix}")


def fetch(outdir: Path, gdrive_id=None, url=None, ext="tar.gz"):
    outdir.mkdir(parents=True, exist_ok=True)
    stamp = outdir / ".done"
    if stamp.exists():
        print(f"already fetched: {outdir}")
        return
    with tempfile.NamedTemporaryFile(
        dir=outdir, suffix=f".{ext}", delete=False
    ) as tmp:
        archive = Path(tmp.name)
    try:
        if gdrive_id:
            download_gdrive(gdrive_id, archive)
        else:
            download_url(url, archive)
        extract(archive, outdir)
        stamp.touch()
        print(f"fetched into {outdir}")
    except (urllib.error.URLError, OSError) as e:
        raise SystemExit(
            f"download failed ({e}).\nThis environment may have no network "
            f"egress — fetch the artifact on a connected machine and place "
            f"its contents under {outdir}/ (then `touch {stamp}`)."
        )
    finally:
        archive.unlink(missing_ok=True)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--preset", choices=sorted(PRESETS))
    parser.add_argument("--gdrive_id")
    parser.add_argument("--url")
    parser.add_argument("--outdir", type=Path, required=True)
    parser.add_argument("--ext", default="tar.gz")
    args = parser.parse_args()

    gdrive_id, url = args.gdrive_id, args.url
    if args.preset:
        kind, locator = PRESETS[args.preset]
        if kind == "gdrive":
            gdrive_id = locator
        else:
            url = locator
    if not (gdrive_id or url):
        parser.error("one of --preset / --gdrive_id / --url is required")
    fetch(args.outdir, gdrive_id=gdrive_id, url=url, ext=args.ext)


if __name__ == "__main__":
    sys.exit(main())
