#!/usr/bin/env python3
"""Stage-0 corpus builder for the pseudo4 recipe: 4 formant-synthesized
pseudo-speakers x 60 utterances (tools/make_pseudo_corpus.py), deterministic.

This recipe exists because the build environment has no network egress to
download VCC corpora; it exercises the full pipeline at production scale on
speech-like material (syllabic structure, fricatives, F0 declination,
distinct per-speaker F0 AND vocal tract scales)."""
import subprocess
import sys
from pathlib import Path

repo = Path(__file__).resolve().parents[4]
recipe = Path(__file__).resolve().parents[1]
subprocess.run(
    [sys.executable, str(repo / "tools" / "make_pseudo_corpus.py"),
     "--outdir", str(recipe / "downloads" / "wav"),
     "--n_utterances", "60", "--duration", "3.0"],
    check=True,
)
