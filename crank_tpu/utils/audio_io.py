"""WAV I/O without libsndfile.

The reference reads/writes audio through soundfile (libsndfile); this build
wraps scipy.io.wavfile with soundfile-compatible semantics: reads return
float64 in [-1, 1) regardless of the on-disk encoding, writes accept float
arrays in [-1, 1] and store PCM16 by default (or float32).
"""

import numpy as np
from scipy.io import wavfile as _wavfile

_INT_SCALE = {
    np.dtype(np.int16): 1 << 15,
    np.dtype(np.int32): 1 << 31,
}


def read_wav(path, always_2d=False, dtype=np.float64):
    """Read a wav file, returning (x, fs) with x normalized floats (like sf.read)."""
    fs, x = _wavfile.read(str(path))
    if x.dtype in _INT_SCALE:
        x = x.astype(dtype) / _INT_SCALE[x.dtype]
    elif x.dtype == np.uint8:
        x = (x.astype(dtype) - 128.0) / 128.0
    else:
        x = x.astype(dtype)
    if always_2d and x.ndim == 1:
        x = x[:, None]
    return x, fs


def write_wav(path, x, fs, subtype="PCM_16"):
    """Write a wav file from float samples in [-1, 1]."""
    x = np.asarray(x)
    if subtype == "FLOAT":
        _wavfile.write(str(path), fs, x.astype(np.float32))
        return
    x = np.clip(x, -1.0, 1.0 - 1.0 / (1 << 15))
    _wavfile.write(str(path), fs, (x * (1 << 15)).astype(np.int16))
