"""crank-tpu: TPU-native non-parallel voice conversion framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of k2kobayashi/crank
(reference layout documented in SURVEY.md): hierarchical VQ-VAE voice conversion
with optional adversarial training (LSGAN / CycleGAN / StarGAN), speaker-adversarial
learning through gradient reversal, mel-filterbank and WORLD/mel-cepstrum feature
pipelines, statistics-based F0 conversion, Griffin-Lim / WORLD synthesis and
MCD / MOSnet objective evaluation over recipe-driven experiments.

Compute path: JAX (jit/pjit over a `jax.sharding.Mesh`), Pallas TPU kernels for
hot ops.  Host path: C++ (`crank_tpu/native`) for the WORLD-style vocoder and DTW.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("CRANK_TPU_PLATFORM"):
    # Force a JAX platform through the live config.  Needed because some
    # environments register/force an accelerator platform from
    # sitecustomize before JAX_PLATFORMS is consulted; CI and stage
    # subprocesses set CRANK_TPU_PLATFORM=cpu to stay off the chip.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["CRANK_TPU_PLATFORM"])
    if _os.environ.get("CRANK_TPU_CPU_DEVICES"):
        _jax.config.update(
            "jax_num_cpu_devices", int(_os.environ["CRANK_TPU_CPU_DEVICES"])
        )

_cache_dir = _os.environ.get(
    "CRANK_TPU_COMPILE_CACHE", _os.path.expanduser("~/.cache/crank_tpu_xla")
)
# CPU runs (tests, stage subprocesses pinned off the chip) skip the cache
# by default: XLA:CPU AOT entries are machine-feature-stamped and reloading
# them warns (and can SIGILL across hosts); CPU compiles are cheap anyway.
# Setting CRANK_TPU_COMPILE_CACHE explicitly overrides this.
_cpu_forced = "cpu" in (
    _os.environ.get("CRANK_TPU_PLATFORM") or _os.environ.get("JAX_PLATFORMS")
    or ""
)
if _cpu_forced and "CRANK_TPU_COMPILE_CACHE" not in _os.environ:
    _cache_dir = ""
if _cache_dir and _cache_dir != "0":
    # Persistent XLA compilation cache: segmented production training (the
    # memory-watchdog relaunch loop, train/trainer.py) re-jits the
    # production-scale step on every segment, and phase flips
    # (cycle/gan start) add new step programs mid-run — on a small host the
    # recompiles cost minutes each.  With the cache they are disk hits.
    # Opt out with CRANK_TPU_COMPILE_CACHE=0; point it elsewhere by path.
    import jax as _jax

    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # older jax without these flags: cache is optional
        pass
