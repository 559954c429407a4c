"""First-party native (C++) DSP library loader.

Replaces the reference's native dependency chain (pyworld/pysptk/fastdtw,
SURVEY.md §2.4) with an in-tree C++ library.  The shared object is built on
first import if missing (g++ is part of the baked toolchain).
"""

import ctypes
import logging
import subprocess
from pathlib import Path

_DIR = Path(__file__).parent
_LIB = _DIR / "lib" / "libcrank_dsp.so"


def _build():
    logging.info("building native DSP library...")
    subprocess.run(["make", "-C", str(_DIR)], check=True, capture_output=True)


def _stale() -> bool:
    if not _LIB.exists():
        return True
    lib_mtime = _LIB.stat().st_mtime
    src = list((_DIR / "src").glob("*.cpp")) + list((_DIR / "src").glob("*.h"))
    return any(p.stat().st_mtime > lib_mtime for p in src)


def load_library() -> ctypes.CDLL:
    if _stale():
        _build()
    lib = ctypes.CDLL(str(_LIB))
    return lib


_lib = None


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = load_library()
    return _lib
