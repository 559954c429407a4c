"""Model-level tests: shapes, gradient reversal, VQ/EMA semantics, frontends.

Covers the reference's module tests (test_vqvae.py, test_spkradv.py,
test_sinc_conv.py) plus properties the reference never tested: EMA codebook
movement, straight-through gradients, GRL sign flip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crank_tpu.models import (
    ConvDiscriminator,
    LogMelFilterBank,
    Quantizer,
    ResidualDiscriminator,
    SincConvFrontend,
    SpeakerAdversarialNetwork,
    VQVAE2,
    VQVAE2Config,
    WaveNetBackbone,
    gradient_reversal,
)
from crank_tpu.models.loss import (
    cross_entropy,
    feature_loss,
    multi_stft_loss,
)

B, T, D = 2, 64, 80


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


def test_wavenet_shapes(key):
    m = WaveNetBackbone(out_channels=64, kernel_size=5, layers=8, stacks=4)
    x = jnp.ones((B, T, 80))
    c = jnp.ones((B, T, 34))
    params = m.init(key, x, c)
    y = m.apply(params, x, c)
    assert y.shape == (B, T, 64)
    assert m.receptive_field == (5 - 1) * sum(2 ** (i % 2) for i in range(8)) + 1


def test_wavenet_causal_shapes(key):
    m = WaveNetBackbone(out_channels=8, kernel_size=3, layers=4, stacks=2,
                        causal=True)
    x = jnp.ones((B, T, 16))
    params = m.init(key, x)
    assert m.apply(params, x).shape == (B, T, 8)


def test_quantizer_ema_updates(key):
    q = Quantizer(emb_dim=8, emb_size=16, ema_flag=True)
    x = jax.random.normal(key, (B, T, 8))
    vs = q.init(key, x)
    cb0 = vs["ema"]["codebook"]
    (emb_idx, qx, idx), new_vars = q.apply(
        vs, x, train=True, use_ema=True, mutable=["ema"]
    )
    assert emb_idx.shape == (B, T, 8) and qx.shape == (B, T, 8)
    assert idx.shape == (B, T) and idx.dtype in (jnp.int32, jnp.int64)
    # codebook must move toward data
    assert not np.allclose(np.asarray(cb0), np.asarray(new_vars["ema"]["codebook"]))
    # eval mode must not move state
    _, nv2 = q.apply(vs, x, train=False, mutable=["ema"])
    np.testing.assert_array_equal(np.asarray(cb0), np.asarray(nv2["ema"]["codebook"]))


def test_quantizer_straight_through(key):
    q = Quantizer(emb_dim=8, emb_size=16, ema_flag=True)
    x = jax.random.normal(key, (B, T, 8))
    vs = q.init(key, x)

    def loss_fn(x):
        _, qx, _ = q.apply(vs, x, train=False)
        return jnp.sum(qx**2)

    g = jax.grad(loss_fn)(x)
    # straight-through: grad wrt x equals grad evaluated at quantized values
    _, qx, _ = q.apply(vs, x, train=False)
    np.testing.assert_allclose(np.asarray(g), np.asarray(2 * qx), rtol=1e-5)


def test_quantizer_param_mode_gradients(key):
    q = Quantizer(emb_dim=8, emb_size=16, ema_flag=False)
    x = jax.random.normal(key, (B, T, 8))
    vs = q.init(key, x)

    def dict_loss(params):
        emb_idx, _, _ = q.apply({"params": params}, x, train=True)
        return jnp.mean((emb_idx - jax.lax.stop_gradient(x)) ** 2)

    g = jax.grad(dict_loss)(vs["params"])
    assert float(jnp.abs(g["codebook"]).sum()) > 0


def test_gradient_reversal():
    x = jnp.ones((4,))
    g = jax.grad(lambda x: jnp.sum(gradient_reversal(x, 0.5) * 2.0))(x)
    np.testing.assert_allclose(np.asarray(g), -0.5 * 2.0 * np.ones(4))


def test_spkradv_forward(key):
    m = SpeakerAdversarialNetwork(spkr_size=4, scale=0.1)
    enc = [jnp.ones((B, T, 64)), jnp.ones((B, T, 64))]
    params = m.init(key, enc)
    out = m.apply(params, enc)
    assert out.shape == (B, T, 4)


def test_discriminators(key):
    d1 = ConvDiscriminator(out_channels=1, kernel_size=5, layers=4)
    x = jnp.ones((B, T, 83))
    p1 = d1.init(key, x)
    assert d1.apply(p1, x).shape == (B, T, 1)

    d2 = ResidualDiscriminator(out_channels=1, kernel_size=5, layers=8,
                               stacks=4, dropout=0.25)
    p2 = d2.init(key, x)
    assert d2.apply(p2, x, deterministic=True).shape == (B, T, 1)


def _tiny_cfg(**kw):
    base = dict(
        input_size=D, output_size=D, n_vq_stacks=2,
        n_layers=(2, 2, 2), n_layers_stacks=(2, 2, 2),
        kernel_size=(3, 3, 3), emb_dim=(16, 16, 16), emb_size=(32, 32, 32),
        spkr_size=4, ema_flag=True,
    )
    base.update(kw)
    return VQVAE2Config(**base)


def test_vqvae_forward(key):
    cfg = _tiny_cfg()
    model = VQVAE2(cfg)
    x = jax.random.normal(key, (B, T, D))
    dec_h = jnp.ones((B, T, 2))  # lcf0 + uv
    spkrvec = jnp.zeros((B, T), jnp.int32)
    vs = model.init(key, x, None, dec_h, spkrvec)
    out, new_vars = model.apply(
        vs, x, None, dec_h, spkrvec, train=True, mutable=["ema"]
    )
    assert out["decoded"].shape == (B, T, D)
    assert len(out["encoded"]) == 2 and len(out["emb_idx"]) == 2
    assert out["encoded"][0].shape == (B, T, 16)
    assert out["emb_idx"][0].shape == (B, T, 16)  # bottom-first
    assert out["qidx"][0].shape == (B, T)
    # EMA moved
    before = vs["ema"]["quantizer_0"]["codebook"]
    after = new_vars["ema"]["quantizer_0"]["codebook"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_vqvae_cycle_forward(key):
    cfg = _tiny_cfg(n_cycles=1)
    model = VQVAE2(cfg)
    x = jax.random.normal(key, (B, T, D))
    dec_h = jnp.ones((B, T, 2))
    spk_o = jnp.zeros((B, T), jnp.int32)
    spk_c = jnp.ones((B, T), jnp.int32)
    vs = model.init(key, x, None, dec_h, spk_o)
    outs, _ = model.apply(
        vs, x, None, dec_h, None, dec_h, spk_o, spk_c,
        train=True, mutable=["ema"], method=VQVAE2.cycle_forward,
    )
    assert len(outs) == 1
    for lbl in ("org", "cv", "recon"):
        assert outs[0][lbl]["decoded"].shape == (B, T, D)


def test_vqvae_raw_frontend(key):
    hop, fftl = 128, 512
    cfg = _tiny_cfg(use_raw=True, fftl=fftl, win_length=fftl, hop_size=hop,
                    mlfb_dim=D)
    model = VQVAE2(cfg)
    raw = jax.random.normal(key, (B, fftl + hop * T - 1)) * 0.1
    dec_h = None
    spkrvec = jnp.zeros((B, T), jnp.int32)
    vs = model.init(key, raw, None, dec_h, spkrvec)
    out = model.apply(vs, raw, None, dec_h, spkrvec)
    assert out["decoded"].shape == (B, T, D)


def test_logmel_frontend_matches_offline(key, speech_like_wav):
    """On-the-fly frontend over a frame-aligned crop == offline extractor rows
    (the reference's most valuable test pattern, test_feature_pytorch.py)."""
    from crank_tpu.dsp import logmelfilterbank

    x, fs = speech_like_wav
    hop, fftl, nmels = 128, 1024, 80
    batch_len, p = 50, 30
    ref = logmelfilterbank(x, fs, hop_size=hop, fft_size=fftl, win_length=fftl,
                           window="hann", num_mels=nmels, fmin=80, fmax=7600)
    ref = ref[p : p + batch_len]
    crop = x[p * hop - fftl // 2 : p * hop + hop * batch_len - 1 + fftl // 2]
    layer = LogMelFilterBank(fs=fs, hop_size=hop, fft_size=fftl,
                             win_length=fftl, window="hann", center=False,
                             n_mels=nmels, fmin=80, fmax=7600)
    vs = layer.init(key, jnp.asarray(crop, jnp.float32)[None])
    out = np.asarray(layer.apply(vs, jnp.asarray(crop, jnp.float32)[None]))[0]
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_sinc_frontend(key):
    hop = 128
    m = SincConvFrontend(sinc_channels=8, sinc_kernel_size=65, out_channels=D,
                         pool_kernel_sizes=(4, 4, 4, 2), fs=22050.0)
    raw = jax.random.normal(key, (B, hop * T))
    vs = m.init(key, raw)
    out = m.apply(vs, raw)
    assert out.shape == (B, T, D)


def test_losses():
    k = jax.random.PRNGKey(3)
    x = jax.random.normal(k, (B, T, D))
    y = jax.random.normal(jax.random.PRNGKey(4), (B, T, D))
    mask = jnp.ones((B, T, 1), bool).at[:, -10:].set(False)
    assert float(feature_loss(x, x, mask)) == 0.0
    assert float(feature_loss(x, y, mask, loss_type="mse")) > 0
    # causal trims
    v = feature_loss(x, y, mask, causal=True, causal_size=4)
    assert np.isfinite(float(v))
    v = feature_loss(x, y, mask, causal=True, causal_size=-4)
    assert np.isfinite(float(v))
    s = multi_stft_loss(x, y)
    assert float(s) > 0 and float(multi_stft_loss(x, x)) < 1e-6
    logits = jax.random.normal(k, (16, 4))
    labels = jnp.array([0, 1, 2, 3] * 4).at[0].set(-100)
    ce = cross_entropy(logits, labels)
    assert np.isfinite(float(ce))
