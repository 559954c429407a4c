"""Device mesh and sharding helpers.

The framework is data-parallel by construction (SURVEY.md §2.5): one jitted
train step written against the *global* batch, with the batch dimension
sharded over the 'data' mesh axis and parameters replicated.  XLA inserts the
gradient all-reduces and the VQ-EMA statistics reductions over ICI; nothing in
the step function is device-count-specific, so the same code runs 1-chip,
v5e-8, or multi-slice.  A 'model' axis is reserved in the mesh signature for
future tensor parallelism (models here are <10M params, so it stays size 1).
"""

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices).reshape(len(devices), 1), ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Put array values of a batch dict on device, sharded along 'data'.

    Multi-host (jax.process_count() > 1): each process passes only its LOCAL
    rows (the loaders are process-sharded, see train/dataset.py) and the
    global array is assembled from per-process shards — no host ever
    materializes or ships the global batch (SURVEY.md §2.5's replacement for
    the reference's process-level cluster story)."""
    sh = batch_sharding(mesh)
    multiproc = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            if multiproc:
                out[k] = jax.make_array_from_process_local_data(sh, v)
            else:
                out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out


def local_rows(arr) -> np.ndarray:
    """This process's rows of a batch-sharded global array, in global row
    order (the full array when single-process / fully addressable)."""
    if not isinstance(arr, jax.Array) or arr.is_fully_addressable:
        return np.asarray(arr)
    shards = sorted(
        arr.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


class DeviceLostError(RuntimeError):
    """The accelerator stopped answering (tunnel drop, worker preemption,
    pool reclaim).  Raised by fetch_replicated when a device->host readback
    exceeds CRANK_TPU_FETCH_TIMEOUT_S; the train CLI converts it (and
    jax's UNAVAILABLE runtime errors) to exit code 76 so the stage
    runner's relaunch loop can probe-wait for the device and resume from
    the latest checkpoint (crank_tpu/bin/run.py).  The reference has no
    failure-recovery story at all — a wedged CUDA context kills the run."""


# 0 disables.  A healthy readback is ms (the async dispatch pipeline in
# front of it is at most seconds); observed tunnel hangs are indefinite,
# so the default only needs to be above any legitimate drain time.
FETCH_TIMEOUT_S = float(os.environ.get("CRANK_TPU_FETCH_TIMEOUT_S", "600"))

_fetch_worker = None


def fetch_replicated(tree, timeout_s=None):
    """device_get that is safe for replicated arrays on multi-host (plain
    jax.device_get refuses non-fully-addressable arrays).

    The readback runs on a persistent worker thread with a deadline: a
    blocked C++ transfer cannot be interrupted from Python (signal
    handlers never run while the fetch holds the calling thread), so the
    main thread waits with a timeout and abandons the worker on expiry —
    the process is about to exit 76, taking the wedged runtime with it."""
    def get(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(x.addressable_data(0))
        return np.asarray(x)

    def fetch():
        return jax.tree_util.tree_map(get, tree)

    t = FETCH_TIMEOUT_S if timeout_s is None else timeout_s
    if not t or t <= 0:
        return fetch()
    global _fetch_worker
    if _fetch_worker is None:
        from concurrent.futures import ThreadPoolExecutor

        _fetch_worker = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="devfetch"
        )
    from concurrent.futures import TimeoutError as _FTimeout

    fut = _fetch_worker.submit(fetch)
    try:
        return fut.result(timeout=t)
    except _FTimeout:
        # the worker thread stays blocked inside the runtime; mark the
        # executor dead so a (never-expected) later call does not queue
        # behind it
        _fetch_worker = None
        raise DeviceLostError(
            f"device readback exceeded {t:.0f}s — accelerator lost "
            "(tunnel drop / worker preemption)"
        )


def replicate(tree, mesh: Mesh):
    """Replicate a pytree of arrays across the mesh."""
    sh = replicated(mesh)
    return jax.device_put(tree, sh)


# ------------------------------ wire codec ------------------------------- #
#
# Host->device transfer is the training loop's bandwidth bottleneck (tunneled
# single-chip here; DCN-fed hosts at scale). Batches are compressed on the
# wire: binary-valued arrays (masks, uv flags, one-hots) travel as uint8
# (lossless), integer label arrays as int8 (lossless: speaker ids and the
# -100 ignore index fit), and real-valued feature arrays optionally as
# float16 (~5e-4 relative error on standardized features, far below feature
# extraction noise; set wire_dtype: float32 in the conf to disable).
# A tiny jitted cast on device restores float32/int32 for the step functions.

_WIRE_BINARY = frozenset((
    "uv", "encoder_mask", "decoder_mask", "cycle_encoder_mask",
    "cycle_decoder_mask", "org_h_onehot", "cv_h_onehot",
))
_WIRE_INT = frozenset(("org_h", "cv_h"))


def encode_wire(batch: dict, feat_dtype=np.float16) -> dict:
    out = {}
    for k, v in batch.items():
        if not isinstance(v, np.ndarray):
            out[k] = v
        elif k in _WIRE_BINARY:
            out[k] = v.astype(np.uint8)
        elif k in _WIRE_INT:
            # int8 only when actually lossless (spkr ids < 128 and the
            # -100 ignore index); a >127-speaker corpus falls back to i16
            if v.size == 0 or (v.max() < 128 and v.min() >= -128):
                out[k] = v.astype(np.int8)
            else:
                out[k] = v.astype(np.int16)
        elif np.issubdtype(v.dtype, np.floating):
            out[k] = v.astype(feat_dtype)
        else:
            out[k] = v
    return out


@jax.jit
def decode_wire(batch: dict) -> dict:
    out = {}
    for k, v in batch.items():
        if v.dtype == jnp.uint8 or jnp.issubdtype(v.dtype, jnp.floating):
            out[k] = v.astype(jnp.float32) if v.dtype != jnp.float32 else v
        elif jnp.issubdtype(v.dtype, jnp.integer):
            out[k] = v.astype(jnp.int32) if v.dtype != jnp.int32 else v
        else:
            out[k] = v
    return out


def pad_batch_to(batch: dict, batch_size: int) -> dict:
    """Right-pad a (possibly ragged last) batch to a fixed batch size by
    repeating the final sample; returns (batch, n_valid)."""
    first = next(v for v in batch.values() if isinstance(v, np.ndarray))
    n = first.shape[0]
    if n == batch_size:
        return batch, n
    reps = batch_size - n
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            pad = np.repeat(v[-1:], reps, axis=0)
            out[k] = np.concatenate([v, pad], axis=0)
        elif isinstance(v, list):
            out[k] = v + [v[-1]] * reps
        else:
            out[k] = v
    return out, n
