"""Analysis windows.

The reference uses scipy symmetric windows for offline analysis
(crank/feature/feature.py:169-179) and periodic windows in the on-the-fly
torch frontend (crank/net/module/mlfb.py:100-101); both variants are exposed
here.  The ITU-G.729 window follows the published formula (reference
implementation at crank/feature/feature.py:182-197).
"""

import numpy as np
from scipy.signal import windows as _w


def itug_729_window(length: int) -> np.ndarray:
    """ITU-T G.729-style asymmetric analysis window.

    First 5/6 of the window is a Hamming-like half, the final 1/6 a cosine
    taper (crank/feature/feature.py:182-197 semantics).
    """
    n = np.arange(length)
    win = np.zeros(length)
    tail = length // 6
    win[: length - tail] = 0.54 - 0.46 * np.cos(
        (2.0 * np.pi * (n[tail:] - length / 6.0)) / (5.0 * length / 3.0 - 1.0)
    )
    win[length - tail :] = np.cos((2.0 * np.pi * n[:tail]) / (2.0 * length / 3.0 - 1.0))
    return win


def get_window(name, length: int, periodic: bool = False) -> np.ndarray:
    """Return a window array by name; passes arrays through unchanged."""
    if isinstance(name, np.ndarray):
        return name
    sym = not periodic
    if name == "hann":
        return _w.hann(length, sym=sym)
    if name == "hamming":
        return _w.hamming(length, sym=sym)
    if name == "itu-g":
        return itug_729_window(length)
    if name == "blackman":
        return _w.blackman(length, sym=sym)
    raise ValueError(f"unknown window type: {name}")


def pad_center(window, n_fft: int):
    """Center-pad a window to n_fft (librosa/torch.stft convention)."""
    import numpy as np

    window = np.asarray(window)
    if len(window) == n_fft:
        return window
    lpad = (n_fft - len(window)) // 2
    return np.pad(window, (lpad, n_fft - len(window) - lpad))
