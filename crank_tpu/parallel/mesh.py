"""Device mesh and sharding helpers.

The framework is data-parallel by construction (SURVEY.md §2.5): one jitted
train step written against the *global* batch, with the batch dimension
sharded over the 'data' mesh axis and parameters replicated.  XLA inserts the
gradient all-reduces and the VQ-EMA statistics reductions over ICI; nothing in
the step function is device-count-specific, so the same code runs 1-chip,
v5e-8, or multi-slice.  A 'model' axis is reserved in the mesh signature for
future tensor parallelism (models here are <10M params, so it stays size 1).
"""

from typing import Optional

import jax
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
    """Put array values of a batch dict on device, sharded along 'data'."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out


def replicate(tree, mesh: Mesh):
    """Replicate a pytree of arrays across the mesh."""
    sh = replicated(mesh)
    return jax.device_put(tree, sh)


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
