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
