"""Checkpoint save/restore.

Same ``checkpoint_{N}steps.pkl`` naming and auto-latest selection as the
reference (crank/net/trainer/basetrainer.py:131-140, crank/bin/train.py:
186-192), improved per SURVEY.md §5: optimizer state, VQ EMA buffers and the
RNG key are saved alongside the parameters so resume is exact.
"""

import pickle
import re
from pathlib import Path

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(expdir, state):
    expdir = Path(expdir)
    expdir.mkdir(parents=True, exist_ok=True)
    path = expdir / f"checkpoint_{int(state['steps'])}steps.pkl"
    payload = {
        "steps": int(state["steps"]),
        "params": _to_numpy(state["params"]),
        "ema": _to_numpy(state["ema"]),
        "opt": _to_numpy(state["opt"]),
        "rng": np.asarray(state["rng"]),
    }
    with open(path, "wb") as fp:
        pickle.dump(payload, fp)
    return path


def load_checkpoint(path):
    with open(path, "rb") as fp:
        payload = pickle.load(fp)
    return payload


def find_latest_checkpoint(expdir):
    pkls = list(Path(expdir).glob("checkpoint_*steps.pkl"))
    if not pkls:
        return None
    steps = [int(re.findall(r"[0-9]+", p.stem)[0]) for p in pkls]
    return pkls[int(np.argmax(steps))]
