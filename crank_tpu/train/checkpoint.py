"""Checkpoint save/restore.

Same ``checkpoint_{N}steps.pkl`` naming and auto-latest selection as the
reference (crank/net/trainer/basetrainer.py:131-140, crank/bin/train.py:
186-192), improved per SURVEY.md §5: optimizer state, VQ EMA buffers and the
RNG key are saved alongside the parameters so resume is exact.

Durability improvements over the reference's bare ``torch.save``:

* **atomic**: serialized to ``<name>.tmp`` then ``os.replace``d into place,
  so a crash/OOM-kill mid-write can never leave a truncated "latest"
  checkpoint (the memory-watchdog relaunch depends on this);
* **async** (``async_write=True``): device->host fetch happens in the
  caller (cheap; params are ~MBs), but pickling + disk I/O run on a single
  background writer thread so the train loop resumes immediately.  Call
  :func:`wait_pending` before process exit/relaunch.
"""

import os
import pickle
import re
import threading
from pathlib import Path

import jax
import numpy as np

_writer_lock = threading.Lock()
_pending: list = []  # at most one in-flight writer thread
_writer_error: list = []  # first unreported async-writer failure


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _write_atomic(path, payload):
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "wb") as fp:
        pickle.dump(payload, fp)
        fp.flush()
        os.fsync(fp.fileno())
    os.replace(tmp, path)


def _write_atomic_bg(path, payload):
    try:
        _write_atomic(path, payload)
    except BaseException as e:  # surfaced by the next save/wait_pending
        with _writer_lock:
            _writer_error.append(e)


def _raise_writer_error():
    with _writer_lock:
        err = _writer_error.pop(0) if _writer_error else None
    if err is not None:
        raise RuntimeError(
            "async checkpoint write failed — training state was NOT saved"
        ) from err


def wait_pending():
    """Block until the in-flight async checkpoint write (if any) finishes.

    Raises if that write failed — a lost checkpoint must never be silent
    (the watchdog relaunch depends on the latest checkpoint existing).
    """
    with _writer_lock:
        threads = list(_pending)
    for t in threads:
        t.join()
    _raise_writer_error()


def save_checkpoint(expdir, state, async_write=False):
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
    if not async_write:
        wait_pending()  # never interleave with an async writer
        _write_atomic(path, payload)
        return path
    wait_pending()  # single writer: previous save must land first (raises
    #                 if it failed, so failures surface at the next save)
    t = threading.Thread(
        target=_write_atomic_bg, args=(path, payload), daemon=True
    )
    with _writer_lock:
        _pending.clear()
        _pending.append(t)
    t.start()
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
