#!/usr/bin/env python
"""Conversion real-time-factor benchmark.

Measures end-to-end conversion of a 10-second utterance: VQVAE2 forward
(production scale) + 100-iteration Griffin-Lim synthesis, both on device.
Target from BASELINE.json: RTF < 0.05.

Prints one JSON line {"metric": "conversion_rtf", ...}.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from crank_tpu.configs import default_conf
    from crank_tpu.dsp.gl import _griffin_lim_impl
    from crank_tpu.dsp.stft_jax import full_window
    from crank_tpu.models import VQVAE2, VQVAE2Config

    conf = default_conf()
    fs, hop, n_fft = 22050, 128, 1024
    dur_s = 10.0
    T = int(dur_s * fs / hop)
    T = -(-T // 64) * 64  # bucket

    model = VQVAE2(VQVAE2Config.from_conf(conf, 4))
    x = jnp.zeros((1, T, conf["input_size"]), jnp.float32)
    dec_h = jnp.zeros((1, T, 2), jnp.float32)
    spkrvec = jnp.zeros((1, T), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, None, dec_h, spkrvec)

    inv_basis = jnp.asarray(
        np.linalg.pinv(
            __import__(
                "crank_tpu.dsp.mel", fromlist=["mel_filterbank"]
            ).mel_filterbank(fs, n_fft, 80, 80, 7600)
        ),
        jnp.float32,
    )
    win = jnp.asarray(full_window("hann", n_fft, n_fft), jnp.float32)

    @jax.jit
    def convert(variables, mlfb, dec_h, spkrvec, key):
        out = model.apply(variables, mlfb, None, dec_h, spkrvec, train=False)
        spc = jnp.power(10.0, out["decoded"]) @ inv_basis.T
        wav = _griffin_lim_impl(
            jnp.abs(spc), win, key,
            n_fft=n_fft, hop_size=hop, n_iters=100, momentum=0.99,
        )
        return wav

    key = jax.random.PRNGKey(1)
    wav = convert(variables, x, dec_h, spkrvec, key)
    jax.block_until_ready(wav)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        wav = convert(variables, x, dec_h, spkrvec, key)
    jax.block_until_ready(wav)
    dt = (time.perf_counter() - t0) / n
    audio_s = hop * (T - 1) / fs
    rtf = dt / audio_s
    print(json.dumps({
        "metric": "conversion_rtf",
        "value": round(rtf, 5),
        "unit": "sec_compute/sec_audio",
        "vs_baseline": round(0.05 / max(rtf, 1e-9), 2),
    }))


if __name__ == "__main__":
    main()
