"""Neural vocoder tests: shapes, training-step convergence, decode path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crank_tpu.vocoder.loss import multi_resolution_stft_loss
from crank_tpu.vocoder.model import MelUpsampler, PWGVocoder
from crank_tpu.vocoder.train import VocoderDataset, VocoderTrainer

HOP = 128
TINY = {
    "layers": 4, "stacks": 2, "upsample_strides": [8, 4, 4],
    "aux_channels": 16, "batch_size": 8, "batch_max_frames": 24,
    "n_steps_print_loss": 1000, "n_steps_save_model": 100000,
    "discriminator_train_start_steps": 1,
    "stft_fft_sizes": [256, 512], "stft_hop_sizes": [64, 128],
    "stft_win_sizes": [128, 256],
}


def test_upsampler_shape():
    m = MelUpsampler(channels=16, strides=(8, 4, 4))
    c = jnp.zeros((2, 10, 16))
    out = m.apply(m.init(jax.random.PRNGKey(0), c), c)
    assert out.shape == (2, 10 * HOP, 16)


def test_vocoder_forward_shape():
    g = PWGVocoder(layers=2, stacks=1, aux_channels=16,
                   upsample_strides=(8, 4, 4))
    assert g.hop_size == HOP
    z = jnp.zeros((2, 24 * HOP))
    c = jnp.zeros((2, 24, 16))
    y = g.apply(g.init(jax.random.PRNGKey(0), z, c), z, c)
    assert y.shape == (2, 24 * HOP)
    assert (np.abs(np.asarray(y)) <= 1.0).all()


def test_multi_res_stft_loss():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 4096))
    sc, lm = multi_resolution_stft_loss(x, x, (256,), (64,), (128,))
    assert float(sc) < 1e-6 and float(lm) < 1e-6
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 4096))
    sc, lm = multi_resolution_stft_loss(x, y, (256,), (64,), (128,))
    assert float(sc) > 0 and float(lm) > 0


def test_vocoder_trainer_steps(tmp_path):
    """A few steps incl. the adversarial phase must run and reduce G loss."""
    trainer = VocoderTrainer(TINY, tmp_path)

    class FakeDataset:
        def __init__(self):
            rng = np.random.default_rng(0)
            t = np.arange(TINY["batch_max_frames"] * HOP) / 22050
            self.w = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
            self.m = rng.standard_normal(
                (TINY["batch_max_frames"], 16)
            ).astype(np.float32)

        def batch(self, n):
            return (np.stack([self.w] * n), np.stack([self.m] * n))

    ds = FakeDataset()
    trainer.train(ds, n_steps=3)
    assert trainer.steps == 3
    assert list(tmp_path.glob("checkpoint_*steps.pkl"))
    wav = trainer.decode_mel(ds.m)
    assert wav.shape == (TINY["batch_max_frames"] * HOP,)
    assert np.isfinite(wav).all()


def test_vocoder_dataset(tmp_path):
    from crank_tpu.features.store import write_features
    from crank_tpu.utils.audio_io import write_wav

    rng = np.random.default_rng(0)
    wavs, feats = {}, {}
    for i in range(3):
        uid = f"SF1_{i}"
        x = rng.standard_normal(HOP * 50).astype(np.float32) * 0.1
        wavf = tmp_path / f"{uid}.wav"
        write_wav(wavf, x, 22050)
        h5f = tmp_path / f"{uid}.h5"
        write_features(h5f, {"mlfb": rng.standard_normal((50, 16))})
        wavs[uid], feats[uid] = str(wavf), str(h5f)
    ds = VocoderDataset(wavs, feats, hop_size=HOP, batch_max_frames=20,
                        ext="mlfb")
    w, m = ds.batch(4)
    assert w.shape == (4, 20 * HOP) and m.shape == (4, 20, 16)


def test_aux_feature_helpers(tmp_path):
    """mcep-path conditioning: [mcep(+0th), lcf0, uv] concat + channel calc
    (mel path unchanged)."""
    from crank_tpu.features.store import write_features
    from crank_tpu.vocoder.train import (
        VocoderDataset,
        aux_channels_for,
        aux_exts_for,
        concat_aux_features,
    )

    conf_mel = {"output_feat_type": "mlfb",
                "feature": {"mlfb_dim": 24, "mcep_dim": 10}}
    conf_mcep = {"output_feat_type": "mcep",
                 "feature": {"mlfb_dim": 24, "mcep_dim": 10}}
    assert aux_exts_for(conf_mel) == ("mlfb",)
    assert aux_exts_for(conf_mel, decoded=True) == ("feats",)
    assert aux_exts_for(conf_mcep) == ("mcep", "lcf0", "uv")
    assert aux_exts_for(conf_mcep, decoded=True) == ("feats", "lcf0", "uv")
    assert aux_channels_for(conf_mel) == 24
    assert aux_channels_for(conf_mcep) == 13  # 11 mcep + lcf0 + uv

    rng = np.random.default_rng(0)
    h5f = tmp_path / "u.h5"
    write_features(h5f, {
        "mcep": rng.standard_normal((20, 11)).astype(np.float32),
        "lcf0": rng.standard_normal(20).astype(np.float32),  # 1-D key
        "uv": np.ones((20, 1), np.float32),
    })
    aux = concat_aux_features(h5f, ("mcep", "lcf0", "uv"))
    assert aux.shape == (20, 13)
    np.testing.assert_array_equal(aux[:, -1], 1.0)

    from crank_tpu.utils.audio_io import write_wav

    wavf = tmp_path / "u.wav"
    write_wav(wavf, 0.1 * rng.standard_normal(20 * 128), 22050)
    ds = VocoderDataset({"u": str(wavf)}, {"u": str(h5f)}, hop_size=128,
                        batch_max_frames=8, ext=("mcep", "lcf0", "uv"))
    w, m = ds.batch(2)
    assert w.shape == (2, 8 * 128) and m.shape == (2, 8, 13)
