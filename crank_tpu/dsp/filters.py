"""Host-side filtering utilities (scipy-backed).

Reference semantics: 255-tap FIR high-pass at 70 Hz applied causally
(crank/utils/utils.py:190-198).
"""

import numpy as np
from scipy.signal import firwin, lfilter


def low_cut_filter(x, fs, cutoff=70):
    nyquist = fs // 2
    norm_cutoff = cutoff / nyquist
    fil = firwin(255, norm_cutoff, pass_zero=False)
    return lfilter(fil, 1, np.asarray(x))
