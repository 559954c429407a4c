"""F0 post-processing: continuous-F0 interpolation and statistics transform.

Reference semantics: crank/utils/utils.py:272-304 (continuous F0) and
crank/net/trainer/dataset.py:290-293 (Gaussian mean/variance transform in the
log-F0 domain).
"""

import numpy as np


def convert_continuous_f0(f0):
    """Linearly interpolate F0 through unvoiced regions.

    Returns (uv, cont_f0): binary voiced mask (float32) and continuous F0.
    """
    f0 = np.copy(np.asarray(f0))
    uv = np.float32(f0 != 0)
    if not np.any(f0 != 0):
        return uv, f0
    start_f0 = f0[f0 != 0][0]
    end_f0 = f0[f0 != 0][-1]
    start_idx = np.where(f0 == start_f0)[0][0]
    end_idx = np.where(f0 == end_f0)[0][-1]
    f0[:start_idx] = start_f0
    f0[end_idx:] = end_f0
    nz = np.where(f0 != 0)[0]
    cont_f0 = np.interp(np.arange(len(f0)), nz, f0[nz])
    return uv, cont_f0


def convert_f0(scaler, lcf0, org_spkr_name, cv_spkr_name):
    """Mean/variance transform of log-F0 from org to cv speaker statistics."""
    org = scaler[org_spkr_name]["lcf0"]
    cv = scaler[cv_spkr_name]["lcf0"]
    return (lcf0 - org.mean_) / np.sqrt(org.var_) * np.sqrt(cv.var_) + cv.mean_
