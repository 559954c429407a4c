"""Waveform multi-resolution STFT loss (vocoder training).

Spectral-convergence + log-STFT-magnitude terms over several resolutions —
the standard Parallel WaveGAN objective, computed with the in-tree JAX STFT.
"""

from typing import Sequence

import jax.numpy as jnp

from crank_tpu.models.loss import _stft_mag


def stft_loss_terms(x, y, n_fft, hop, win):
    """x, y: [B, L] waveforms -> (spectral_convergence, log_magnitude_l1)."""
    xm = _stft_mag(x, n_fft, hop, win)
    ym = _stft_mag(y, n_fft, hop, win)
    sc = jnp.linalg.norm(ym - xm) / jnp.maximum(jnp.linalg.norm(ym), 1e-9)
    lm = jnp.mean(jnp.abs(jnp.log(ym) - jnp.log(xm)))
    return sc, lm


def multi_resolution_stft_loss(
    x,
    y,
    fft_sizes: Sequence[int] = (1024, 2048, 512),
    hop_sizes: Sequence[int] = (120, 240, 50),
    win_sizes: Sequence[int] = (600, 1200, 240),
):
    sc_total, lm_total = 0.0, 0.0
    for n_fft, hop, win in zip(fft_sizes, hop_sizes, win_sizes):
        sc, lm = stft_loss_terms(x, y, n_fft, hop, win)
        sc_total += sc
        lm_total += lm
    n = len(fft_sizes)
    return sc_total / n, lm_total / n
