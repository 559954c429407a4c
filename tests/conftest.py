import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding is exercised
# without TPU hardware (SURVEY.md §4 implication).
os.environ["JAX_PLATFORMS"] = "cpu"
# inherited by stage subprocesses (crank_tpu honors these even when a
# sitecustomize hook force-registers an accelerator platform)
os.environ["CRANK_TPU_PLATFORM"] = "cpu"
os.environ["CRANK_TPU_CPU_DEVICES"] = "8"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# jax may already have been imported by the interpreter's sitecustomize (TPU
# tunnel registration), capturing JAX_PLATFORMS before this file runs — force
# the CPU backend through the live config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def speech_like_wav(rng):
    """Synthetic voiced-speech-like waveform: harmonics + noise, 22.05 kHz."""
    fs = 22050
    dur = 1.2
    t = np.arange(int(fs * dur)) / fs
    f0 = 140.0 + 30.0 * np.sin(2 * np.pi * 2.3 * t)
    phase = 2 * np.pi * np.cumsum(f0) / fs
    x = np.zeros_like(t)
    for k, amp in enumerate([0.5, 0.3, 0.2, 0.1, 0.05], start=1):
        x += amp * np.sin(k * phase)
    # amplitude envelope with an unvoiced (noise) segment in the middle
    env = 0.5 * (1 + np.sin(2 * np.pi * 1.1 * t - np.pi / 2))
    x *= env
    n0, n1 = int(0.55 * fs), int(0.7 * fs)
    x[n0:n1] = 0.05 * rng.standard_normal(n1 - n0)
    x += 0.002 * rng.standard_normal(len(x))
    x /= np.abs(x).max() * 1.1
    return x.astype(np.float64), fs
