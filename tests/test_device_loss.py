"""Failure detection/recovery: deadline-guarded device readback.

SURVEY.md §5 failure-detection row.  A tunneled/pooled accelerator can
stop answering mid-run (observed: indefinite block inside a device->host
readback); `fetch_replicated` converts that into `DeviceLostError`, the
train CLIs convert it to exit code 76, and `bin/run.py` probe-waits for
the device and relaunches from the latest checkpoint.  The reference has
no equivalent (a wedged CUDA context simply kills the run).
"""

import time

import numpy as np
import pytest

from crank_tpu.parallel.mesh import DeviceLostError, fetch_replicated


class _Slow:
    """Leaf whose readback blocks, like a fetch into a wedged runtime."""

    def __init__(self, seconds):
        self.seconds = seconds

    def __array__(self, dtype=None, copy=None):
        time.sleep(self.seconds)
        return np.ones(2, np.float32)


def test_fetch_replicated_passthrough():
    import jax.numpy as jnp

    out = fetch_replicated({"a": jnp.arange(3), "b": 2.0}, timeout_s=30)
    np.testing.assert_array_equal(out["a"], [0, 1, 2])
    assert out["b"] == 2.0


def test_fetch_timeout_raises_device_lost():
    with pytest.raises(DeviceLostError):
        fetch_replicated({"x": _Slow(3.0)}, timeout_s=0.3)


def test_fetch_recovers_after_abandoned_worker():
    # the expired worker is abandoned; a fresh call must not queue behind
    # it (run.py relaunches a new process in production, but the in-process
    # contract should still hold)
    with pytest.raises(DeviceLostError):
        fetch_replicated({"x": _Slow(2.0)}, timeout_s=0.2)
    out = fetch_replicated({"y": np.arange(2)}, timeout_s=10)
    np.testing.assert_array_equal(out["y"], [0, 1])


def test_timeout_disabled_blocks_to_completion():
    out = fetch_replicated({"x": _Slow(0.2)}, timeout_s=0)
    np.testing.assert_array_equal(out["x"], np.ones(2, np.float32))


def test_train_cli_exit_code_wiring():
    # the CLI maps DeviceLostError and UNAVAILABLE runtime errors to 76
    import inspect

    import crank_tpu.bin.train as t

    src = inspect.getsource(t.main)
    assert "DeviceLostError" in src and "76" in src


def test_run_py_wait_for_device_succeeds_quickly():
    import os

    from crank_tpu.bin.run import wait_for_device

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("CRANK_TPU_PLATFORM", None)
    t0 = time.time()
    wait_for_device(env, probe_timeout=120, max_wait_s=10)
    assert time.time() - t0 < 120
