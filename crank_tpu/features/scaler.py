"""Streaming standardization statistics.

First-party replacement for sklearn StandardScaler as used by the reference
(crank/bin/extract_statistics.py): partial_fit accumulation of mean/var with
``mean_`` / ``var_`` / ``scale_`` attributes, picklable, plus transform /
inverse_transform.  (sklearn objects unpickle fine into this pipeline too —
only mean_/var_ are consumed.)
"""

import pickle
from pathlib import Path

import numpy as np


class StandardScaler:
    def __init__(self):
        self.n_samples_seen_ = 0
        self.mean_ = None
        self.var_ = None

    @property
    def scale_(self):
        # sklearn semantics: zero-variance dimensions scale by 1 instead of
        # dividing by 0 (constant mlfb bins on silence-heavy corpora)
        s = np.sqrt(self.var_)
        return np.where(s == 0.0, 1.0, s)

    def partial_fit(self, X):
        X = np.asarray(X, dtype=np.float64)
        if X.ndim == 1:
            X = X[:, None]
        n = X.shape[0]
        if n == 0:
            return self
        if self.mean_ is None:
            self.mean_ = X.mean(axis=0)
            self.var_ = X.var(axis=0)
            self.n_samples_seen_ = n
            return self
        m = self.n_samples_seen_
        new_mean = X.mean(axis=0)
        new_var = X.var(axis=0)
        tot = m + n
        delta = new_mean - self.mean_
        self.var_ = (m * self.var_ + n * new_var + m * n / tot * delta**2) / tot
        self.mean_ = self.mean_ + delta * n / tot
        self.n_samples_seen_ = tot
        return self

    def transform(self, X):
        return (np.asarray(X) - self.mean_) / self.scale_

    def inverse_transform(self, X):
        return np.asarray(X) * self.scale_ + self.mean_


def fit_scalers(feats_files, conf, spk2utt=None, featsscp=None, read_feature=None):
    """Fit global + per-speaker scalers (crank/bin/extract_statistics.py:43-90).

    Returns {ext: scaler, ..., spkr: {"lcf0": scaler}}.
    """
    from crank_tpu.features.store import read_feature as _read

    read_feature = read_feature or _read
    scaler = {}
    exts = ["mlfb", "lcf0"]
    if conf["feature"]["fs"] != 8000:
        exts.append("mcep")
    for win_type in conf["feature"]["window_types"]:
        if win_type != "hann":
            exts.append(f"mlfb_{win_type}")
    import logging

    for ext in exts:
        s = StandardScaler()
        for h5f in feats_files:
            try:
                s.partial_fit(read_feature(h5f, ext))
            except KeyError:
                pass
        if s.n_samples_seen_ == 0:
            # keep the failure visible and early: an unfit scaler pickled
            # here would surface much later as NoneType arithmetic inside
            # transform() during training
            logging.warning(
                "scaler %r saw no samples (feature absent from every h5) "
                "— omitted from scaler.pkl", ext,
            )
            continue
        scaler[ext] = s
    if spk2utt and featsscp:
        for spkr, uids in spk2utt.items():
            s = StandardScaler()
            for uid in uids:
                s.partial_fit(read_feature(featsscp[uid], "lcf0"))
            scaler[spkr] = {"lcf0": s}
    return scaler


def save_scaler(scaler, path):
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as fp:
        pickle.dump(scaler, fp)


def load_scaler(path):
    with open(path, "rb") as fp:
        return pickle.load(fp)
