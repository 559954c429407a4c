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
