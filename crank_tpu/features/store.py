"""Per-utterance HDF5 feature store (feats.scp-compatible with the reference).

Layout parity: one .h5 per utterance with one dataset per feature name
(crank/net/trainer/dataset.py:230-236, sprocket.util.HDF5 semantics); float64
is downcast to float32 on write (crank/feature/feature.py:59-65).
"""

from pathlib import Path

import h5py
import numpy as np


def read_feature(h5f, ext="mlfb"):
    with h5py.File(h5f, "r") as fp:
        data = fp[ext][:]
    if data.ndim == 1:
        return data[:, np.newaxis]
    return data


def list_features(h5f):
    with h5py.File(h5f, "r") as fp:
        return list(fp.keys())


def write_features(h5f, feats: dict, mode="a"):
    Path(h5f).parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(h5f, mode) as fp:
        for k, v in feats.items():
            v = np.asarray(v)
            if v.dtype == np.float64:
                v = v.astype(np.float32)
            if k in fp:
                del fp[k]
            fp.create_dataset(k, data=v)


def feat2hdf5(feat, path, ext="feats"):
    """Append one feature array to <stem>.h5 (crank/utils/utils.py:146-151)."""
    path = Path(path)
    h5f = path.parent / (path.stem + ".h5")
    write_features(h5f, {ext: feat})


def calculate_maxflen(flist, ext="mlfb"):
    max_flen = 0
    for h5f in flist:
        with h5py.File(h5f, "r") as fp:
            max_flen = max(max_flen, fp[ext].shape[0])
    return max_flen
