"""Streaming neural-vocoder tests (causal PWGVocoder, chunked synthesis).

Property under test: driving the causal vocoder chunk-by-chunk through the
conv-state ring buffers reproduces the offline causal forward exactly, and
the fused StreamingConverter(synth="npwg") chunk step emits the same
waveform as (streamed mel -> offline causal vocoder) with the documented
deterministic per-chunk noise.  Beyond-reference capability: the
reference's vocoder stage is offline batch decoding only
(egs/vaevc/template/run.sh:211-229); it has no streaming synthesis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crank_tpu.vocoder.model import PWGVocoder
from crank_tpu.vocoder.streaming import StreamingVocoder

TINY_VOC = {
    "layers": 4, "stacks": 2, "upsample_strides": [4, 2],
    "aux_channels": 8, "causal": True,
}


def _init_params(voc_conf, T):
    g = PWGVocoder(
        layers=voc_conf["layers"], stacks=voc_conf["stacks"],
        aux_channels=voc_conf["aux_channels"],
        upsample_strides=tuple(voc_conf["upsample_strides"]),
        causal=True,
    )
    z = jnp.zeros((1, T * g.hop_size))
    c = jnp.zeros((1, T, voc_conf["aux_channels"]))
    return g, g.init(jax.random.PRNGKey(0), z, c)["params"]


def test_causal_vocoder_streaming_equivalence():
    """Chunked streaming == one offline causal pass (same params, same z)."""
    chunk, n_chunks = 6, 4
    T = chunk * n_chunks
    g_off, params = _init_params(TINY_VOC, T)
    hop = g_off.hop_size

    rng = np.random.default_rng(7)
    mel = rng.standard_normal((1, T, TINY_VOC["aux_channels"])).astype(
        np.float32
    )

    voc = StreamingVocoder(TINY_VOC, params, chunk_frames=chunk, seed=3)
    z_full = voc.noise_for_chunks(n_chunks)
    outs = [
        voc.push(mel[:, t0 : t0 + chunk]) for t0 in range(0, T, chunk)
    ]
    streamed = np.concatenate(outs, axis=1)

    off = g_off.apply({"params": params}, jnp.asarray(z_full), mel)
    np.testing.assert_allclose(streamed, np.asarray(off), atol=1e-5)

    # reset restarts the stream (same caches AND same noise counter)
    voc.reset()
    again = voc.push(mel[:, :chunk])
    np.testing.assert_allclose(again, outs[0], atol=1e-6)


def test_streaming_vocoder_requires_causal():
    with pytest.raises(ValueError, match="causal"):
        StreamingVocoder({**TINY_VOC, "causal": False}, {}, chunk_frames=4)


def test_causal_upsampler_is_causal():
    """Changing mel frame k must not affect samples before k*hop."""
    chunk = 8
    g, params = _init_params(TINY_VOC, chunk)
    hop = g.hop_size
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, chunk, TINY_VOC["aux_channels"])).astype(
        np.float32
    )
    z = rng.standard_normal((1, chunk * hop)).astype(np.float32)
    y0 = np.asarray(g.apply({"params": params}, z, mel))
    mel2 = mel.copy()
    mel2[:, 5:] += 10.0  # perturb frames >= 5 only
    y1 = np.asarray(g.apply({"params": params}, z, mel2))
    np.testing.assert_allclose(y1[:, : 5 * hop], y0[:, : 5 * hop], atol=1e-6)
    assert not np.allclose(y1[:, 5 * hop :], y0[:, 5 * hop :])


def test_vocoder_trainer_causal_steps(tmp_path):
    """The causal variant trains through the same VocoderTrainer path."""
    from crank_tpu.vocoder.train import VocoderTrainer

    conf = {
        **TINY_VOC, "batch_size": 8, "batch_max_frames": 24,
        "n_steps_print_loss": 1000, "n_steps_save_model": 100000,
        "discriminator_train_start_steps": 1,
        "stft_fft_sizes": [64], "stft_hop_sizes": [16],
        "stft_win_sizes": [32],
    }
    trainer = VocoderTrainer(conf, tmp_path)
    hop = trainer.hop
    rng = np.random.default_rng(0)

    class FakeDataset:
        def batch(self, n):
            w = 0.3 * np.sin(
                2 * np.pi * 220 * np.arange(24 * hop) / 22050
            ).astype(np.float32)
            m = rng.standard_normal((24, 8)).astype(np.float32)
            return np.stack([w] * n), np.stack([m] * n)

    trainer.train(FakeDataset(), n_steps=2)
    assert trainer.steps == 2
    wav = trainer.decode_mel(rng.standard_normal((24, 8)))
    assert wav.shape == (24 * hop,) and np.isfinite(wav).all()


def test_streaming_converter_npwg_fused():
    """StreamingConverter(synth='npwg'): the fused chunk step's waveform ==
    offline causal vocoder run on the streamed mel with the deterministic
    fold_in(PRNGKey(voc_seed), chunk_idx) noise."""
    from crank_tpu.convert.streaming import StreamingConverter
    from crank_tpu.features.scaler import StandardScaler
    from crank_tpu.train.factory import build_models, init_models
    from tests.test_train import make_conf

    conf = make_conf(causal=True)
    hop = conf["feature"]["hop_size"]
    D = conf["input_size"]
    chunk, n_chunks = 16, 3
    voc_conf = {
        "layers": 4, "stacks": 2, "upsample_strides": [8, 8],
        "aux_channels": D, "causal": True,
    }
    assert 8 * 8 == hop

    spkrs = {"SF1": 0, "SM1": 1}
    rng = np.random.default_rng(11)
    scaler = {"mlfb": StandardScaler(), "lcf0": StandardScaler()}
    for s, mu in (("SF1", 5.2), ("SM1", 4.6)):
        lc = mu + 0.1 * rng.standard_normal((400, 1))
        scaler[s] = {"lcf0": StandardScaler().partial_fit(lc)}
        scaler["lcf0"].partial_fit(lc)
    scaler["mlfb"].partial_fit(rng.standard_normal((400, D)))

    models = build_models(conf, len(spkrs))
    params, ema = init_models(
        models, conf, len(spkrs), jax.random.PRNGKey(5), B=1, T=chunk
    )
    g_voc, voc_params = _init_params(voc_conf, chunk)

    conv = StreamingConverter(
        conf, len(spkrs), params["G"], ema, scaler, spkrs,
        org_spkr="SF1", cv_spkr="SM1", chunk_frames=chunk,
        synth="npwg", voc_conf=voc_conf, voc_params=voc_params, voc_seed=9,
    )
    Tn = chunk * n_chunks
    mlfb = rng.standard_normal((Tn, D)).astype(np.float32)
    lcf0 = (5.1 + 0.05 * rng.standard_normal((Tn, 1))).astype(np.float32)
    uv = np.ones((Tn, 1), np.float32)

    outs = [
        conv.push(mlfb[t : t + chunk], lcf0[t : t + chunk], uv[t : t + chunk])
        for t in range(0, Tn, chunk)
    ]
    wav_stream = np.concatenate([o["wav"] for o in outs], axis=1)
    mel_stream = np.concatenate([o["mlfb"] for o in outs], axis=1)
    assert wav_stream.shape == (1, Tn * hop)

    # reproduce offline: same per-chunk noise, offline causal vocoder on
    # the converted (de-normalized) mel
    zs = [
        jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(9), i), (1, chunk * hop)
        )
        for i in range(n_chunks)
    ]
    z_full = jnp.concatenate(zs, axis=1)
    off = g_voc.apply(
        {"params": voc_params}, z_full, jnp.asarray(mel_stream)
    )
    np.testing.assert_allclose(wav_stream, np.asarray(off), atol=1e-4)

    # reset restarts both the model caches and the vocoder noise counter
    conv.reset()
    again = conv.push(mlfb[:chunk], lcf0[:chunk], uv[:chunk])
    np.testing.assert_allclose(again["wav"], outs[0]["wav"], atol=1e-5)
