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
* **orbax backend** (``fmt="orbax"`` / conf ``checkpoint_format: orbax``):
  writes ``checkpoint_{N}steps.orbax`` directories through
  ``orbax.checkpoint.StandardCheckpointer`` (tensorstore/OCDBT layout —
  the elastic-pod-run format: per-array chunked storage, its own
  tmp-dir + atomic finalize protocol, readable by any orbax tooling).
  Both formats go through the same single-writer thread and the same
  auto-latest discovery, and :func:`load_checkpoint` detects the format
  from the path, so runs can switch formats between segments.
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
    if path.suffix == ".orbax":
        _write_orbax(path, payload)
        return
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "wb") as fp:
        pickle.dump(payload, fp)
        fp.flush()
        os.fsync(fp.fileno())
    os.replace(tmp, path)


def _write_orbax(path, payload):
    """Synchronous orbax write (runs inside the single writer thread).
    orbax finalizes through its own tmp-dir + rename protocol, so a
    crash mid-write leaves no valid-looking partial checkpoint.

    params/ema/rng are plain dict-of-array pytrees and stay structured
    (readable by any orbax tooling).  The optimizer state contains optax
    namedtuples, which a target-less ``StandardCheckpointer.restore``
    would silently flatten into dicts — store it as indexed leaves plus
    its pickled treedef so :func:`load_checkpoint` rebuilds the exact
    optax state without needing an abstract target tree."""
    import orbax.checkpoint as ocp

    opt_leaves, opt_treedef = jax.tree_util.tree_flatten(payload["opt"])
    doc = {
        "steps": payload["steps"],
        "params": payload["params"],
        "ema": payload["ema"],
        "rng": payload["rng"],
        "opt_flat": {f"{i:05d}": leaf for i, leaf in enumerate(opt_leaves)},
        "opt_treedef": np.frombuffer(
            pickle.dumps(opt_treedef), dtype=np.uint8
        ).copy(),
        # small dict with None values — not an array pytree; ship pickled
        "sched_anchors": np.frombuffer(
            pickle.dumps(payload.get("sched_anchors")), dtype=np.uint8
        ).copy(),
    }
    # The payload is host-resident numpy (params replicated, pulled by the
    # trainer on process 0 only), so the save must NOT be a collective:
    # orbax's default barriers would wait on processes that never call
    # save() and deadlock a pod run.  Restrict the sync domain to this
    # process (the trainer gates saving on process_index == 0).
    mp_opts = ocp.options.MultiprocessingOptions(
        primary_host=jax.process_index(),
        active_processes={jax.process_index()},
        barrier_sync_key_prefix=f"crank_tpu_ckpt_p{jax.process_index()}",
    )
    ckptr = ocp.StandardCheckpointer(multiprocessing_options=mp_opts)
    try:
        ckptr.save(os.path.abspath(path), doc, force=True)
        ckptr.wait_until_finished()
    finally:
        ckptr.close()


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


def save_checkpoint(expdir, state, async_write=False, fmt="pickle"):
    if fmt not in ("pickle", "orbax"):
        raise ValueError(f"unknown checkpoint_format: {fmt}")
    expdir = Path(expdir)
    expdir.mkdir(parents=True, exist_ok=True)
    ext = "pkl" if fmt == "pickle" else "orbax"
    path = expdir / f"checkpoint_{int(state['steps'])}steps.{ext}"
    payload = {
        "steps": int(state["steps"]),
        "params": _to_numpy(state["params"]),
        "ema": _to_numpy(state["ema"]),
        "opt": _to_numpy(state["opt"]),
        "rng": np.asarray(state["rng"]),
        "sched_anchors": state.get("sched_anchors"),
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
    path = Path(path)
    if path.is_dir():  # orbax checkpoint directory
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        try:
            doc = ckptr.restore(os.path.abspath(path))
        finally:
            ckptr.close()
        opt_treedef = pickle.loads(
            np.asarray(doc["opt_treedef"], np.uint8).tobytes()
        )
        opt_leaves = [doc["opt_flat"][k] for k in sorted(doc["opt_flat"])]
        return {
            "steps": int(doc["steps"]),
            "params": doc["params"],
            "ema": doc["ema"],
            "rng": np.asarray(doc["rng"]),
            "opt": jax.tree_util.tree_unflatten(opt_treedef, opt_leaves),
            "sched_anchors": (
                pickle.loads(
                    np.asarray(doc["sched_anchors"], np.uint8).tobytes()
                )
                if "sched_anchors" in doc
                else None
            ),
        }
    with open(path, "rb") as fp:
        payload = pickle.load(fp)
    return payload


def find_latest_checkpoint(expdir):
    ckpts = [
        p
        for pat in ("checkpoint_*steps.pkl", "checkpoint_*steps.orbax")
        for p in Path(expdir).glob(pat)
    ]
    if not ckpts:
        return None
    steps = [int(re.findall(r"[0-9]+", p.stem)[0]) for p in ckpts]
    return ckpts[int(np.argmax(steps))]
