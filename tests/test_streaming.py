"""Streaming (chunked causal) inference tests.

Property under test: feeding chunks through the streaming model (conv-state
caches in the "cache" collection) reproduces the offline causal forward
bit-near-exactly, with the parameter tree shared between both variants.
The reference has no streaming mode (offline conversion only,
crank/net/trainer/basetrainer.py:322-344) — this is a beyond-reference
capability of the TPU build.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crank_tpu.features.scaler import StandardScaler
from crank_tpu.models import VQVAE2, VQVAE2Config, WaveNetBackbone
from crank_tpu.convert.streaming import (
    StreamingConverter,
    causal_hold_continuous_f0,
)

B, T, D = 1, 96, 16
CHUNK = 16


def _chunks(x, size):
    for t0 in range(0, x.shape[1], size):
        yield x[:, t0 : t0 + size]


def test_wavenet_streaming_equivalence():
    m_off = WaveNetBackbone(out_channels=8, kernel_size=3, layers=4,
                            stacks=2, causal=True)
    m_str = WaveNetBackbone(out_channels=8, kernel_size=3, layers=4,
                            stacks=2, causal=True, streaming=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, 12))
    c = jax.random.normal(jax.random.PRNGKey(1), (B, T, 4))
    params = m_off.init(key, x, c)["params"]
    y_off = m_off.apply({"params": params}, x, c)

    cache = jax.tree_util.tree_map(
        jnp.zeros_like, m_str.init(key, x[:, :CHUNK], c[:, :CHUNK])["cache"]
    )
    outs = []
    for xc, cc in zip(_chunks(x, CHUNK), _chunks(c, CHUNK)):
        y, st = m_str.apply(
            {"params": params, "cache": cache}, xc, cc, mutable=["cache"]
        )
        cache = st["cache"]
        outs.append(y)
    y_str = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(y_str, y_off, rtol=1e-5, atol=1e-5)


def test_vqvae_streaming_equivalence():
    cfg = VQVAE2Config(
        input_size=D, output_size=D, n_vq_stacks=2,
        n_layers=(1, 1, 1), n_layers_stacks=(2, 2, 2),
        kernel_size=(3, 3, 3), emb_dim=(8, 8, 8), emb_size=(16, 16, 16),
        causal=True, ema_flag=True, spkr_size=3, use_spkr_embedding=True,
        spkr_embedding_size=4,
    )
    m_off = VQVAE2(cfg)
    m_str = VQVAE2(dataclasses.replace(cfg, streaming=True))
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (B, T, D))
    dec_h = jax.random.normal(jax.random.PRNGKey(3), (B, T, 2))
    spkrvec = jnp.zeros((B, T), jnp.int32)
    v = m_off.init(key, x, None, dec_h, spkrvec, train=False)
    params, ema = v["params"], v["ema"]
    off = m_off.apply(
        {"params": params, "ema": ema}, x, None, dec_h, spkrvec, train=False
    )["decoded"]

    cache = jax.tree_util.tree_map(
        jnp.zeros_like,
        m_str.init(
            key, x[:, :CHUNK], None, dec_h[:, :CHUNK], spkrvec[:, :CHUNK],
            train=False,
        )["cache"],
    )
    outs = []
    for xc, dc, sc in zip(
        _chunks(x, CHUNK), _chunks(dec_h, CHUNK), _chunks(spkrvec, CHUNK)
    ):
        out, st = m_str.apply(
            {"params": params, "ema": ema, "cache": cache},
            xc, None, dc, sc, train=False, mutable=["cache"],
        )
        cache = st["cache"]
        outs.append(out["decoded"])
    streamed = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(streamed, off, rtol=1e-4, atol=1e-4)


def test_streaming_requires_causal():
    cfg = VQVAE2Config(input_size=D, output_size=D, causal=False,
                       streaming=True, spkr_size=2)
    with pytest.raises(ValueError, match="causal"):
        VQVAE2(cfg).init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8, D)), None,
            jnp.zeros((1, 8, 2)), jnp.zeros((1, 8), jnp.int32),
            train=False,
        )


@pytest.fixture(scope="module")
def tiny_setup():
    from tests.test_train import make_conf

    conf = make_conf(causal=True)
    spkrs = {"SF1": 0, "SM1": 1, "TF2": 2}
    rng = np.random.default_rng(11)
    scaler = {"mlfb": StandardScaler(), "lcf0": StandardScaler()}
    for s, mu in (("SF1", 5.2), ("SM1", 4.6), ("TF2", 5.4)):
        lc = mu + 0.1 * rng.standard_normal((400, 1))
        scaler[s] = {"lcf0": StandardScaler().partial_fit(lc)}
        scaler["lcf0"].partial_fit(lc)
    scaler["mlfb"].partial_fit(rng.standard_normal((400, conf["input_size"])))

    from crank_tpu.train.factory import build_models, init_models

    models = build_models(conf, len(spkrs))
    params, ema = init_models(
        models, conf, len(spkrs), jax.random.PRNGKey(5), B=1, T=CHUNK
    )
    return conf, spkrs, scaler, models, params, ema


def test_streaming_converter_matches_offline(tiny_setup):
    conf, spkrs, scaler, models, params, ema = tiny_setup
    rng = np.random.default_rng(13)
    Tn = 64
    mlfb = rng.standard_normal((Tn, conf["input_size"])).astype(np.float32)
    lcf0 = (5.1 + 0.05 * rng.standard_normal((Tn, 1))).astype(np.float32)
    uv = (rng.random((Tn, 1)) > 0.2).astype(np.float32)

    conv = StreamingConverter(
        conf, len(spkrs), params["G"], ema, scaler, spkrs,
        org_spkr="SF1", cv_spkr="SM1", chunk_frames=CHUNK,
    )
    outs = [
        conv.push(mlfb[t : t + CHUNK], lcf0[t : t + CHUNK], uv[t : t + CHUNK])
        for t in range(0, Tn, CHUNK)
    ]
    streamed = np.concatenate([o["mlfb"][0] for o in outs], axis=0)

    # offline: same conditioning math on the whole utterance at once
    enc_h, dec_h, spkrvec = conv._condition(lcf0[None], uv[None])
    x = scaler["mlfb"].transform(mlfb)[None].astype(np.float32)
    off = models["G"].apply(
        {"params": params["G"], "ema": ema},
        x, enc_h, dec_h, spkrvec, train=False,
    )["decoded"]
    off = scaler["mlfb"].inverse_transform(np.asarray(off[0]))
    np.testing.assert_allclose(streamed, off, rtol=1e-3, atol=1e-3)

    # converted F0 follows the target statistics and reset() restarts cleanly
    assert np.all(outs[0]["f0"] >= 0)
    conv.reset()
    again = conv.push(mlfb[:CHUNK], lcf0[:CHUNK], uv[:CHUNK])
    np.testing.assert_allclose(again["mlfb"], outs[0]["mlfb"], atol=1e-5)


def test_causal_hold_continuous_f0():
    f0 = np.array([0.0, 0.0, 100.0, 0.0, 110.0, 0.0])
    uv, cont, last = causal_hold_continuous_f0(f0)
    np.testing.assert_array_equal(uv, [0, 0, 1, 0, 1, 0])
    # leading unvoiced backfilled with first voiced; gaps held causally
    np.testing.assert_allclose(cont, [100, 100, 100, 100, 110, 110])
    assert last == 110.0
    # carried across chunks
    uv2, cont2, last2 = causal_hold_continuous_f0(
        np.array([0.0, 95.0]), prev_value=last
    )
    np.testing.assert_allclose(cont2, [110, 95])
    assert last2 == 95.0


def test_convert_stream_cli(tiny_setup, tmp_path, monkeypatch):
    """End-to-end: wav -> chunked frontend -> streaming model -> GL-OLA wav."""
    import pickle

    import yaml

    from crank_tpu.bin import convert_stream
    from crank_tpu.utils.audio_io import write_wav

    conf, spkrs, scaler, models, params, ema = tiny_setup
    fs = conf["feature"]["fs"]

    # ~0.8 s synthetic voiced utterance
    rng = np.random.default_rng(3)
    t = np.arange(int(fs * 0.8)) / fs
    f0 = 180 * (1 + 0.05 * np.sin(2 * np.pi * 2 * t))
    phase = 2 * np.pi * np.cumsum(f0) / fs
    x = 0.5 * np.sin(phase) + 0.2 * np.sin(2 * phase)
    wavf = tmp_path / "in.wav"
    write_wav(wavf, 0.6 * x / np.abs(x).max(), fs)

    conff = tmp_path / "conf.yml"
    with open(conff, "w") as fp:
        yaml.safe_dump(conf, fp)
    scpdir = tmp_path / "scp" / "train"
    scpdir.mkdir(parents=True)
    (scpdir / "wav.scp").write_text("SF1_000 a.wav\n")
    (scpdir / "utt2spk").write_text("SF1_000 SF1\n")
    (scpdir / "spk2utt").write_text(
        "SF1 SF1_000\nSM1\nTF2\n"
    )
    featdir = tmp_path / "feature"
    (featdir / "mlfb").mkdir(parents=True)
    with open(featdir / "mlfb" / "scaler.pkl", "wb") as fp:
        pickle.dump(scaler, fp)
    ckptf = tmp_path / "checkpoint_2steps.pkl"
    with open(ckptf, "wb") as fp:
        pickle.dump({"steps": 2, "params": params, "ema": ema}, fp)

    outf = tmp_path / "out.wav"
    monkeypatch.setattr(
        "sys.argv",
        ["convert_stream", "--conf", str(conff), "--checkpoint", str(ckptf),
         "--scpdir", str(tmp_path / "scp"), "--featdir", str(featdir),
         "--wav", str(wavf), "--org_spkr", "SF1", "--cv_spkr", "SM1",
         "--out", str(outf), "--chunk_frames", "16", "--gl_iters", "4"],
    )
    convert_stream.main()
    assert outf.exists()
    from crank_tpu.utils.audio_io import read_wav

    y, fs_out = read_wav(outf)
    assert fs_out == fs and len(y) > fs // 2
    assert np.all(np.isfinite(y))


def test_frame_mlfb_matches_offline_extractor():
    """The streaming frontend reproduces dsp/spectrum.logmelfilterbank
    (same symmetric win_length window, reflect convention, eps) for every
    frame whose lookahead is available."""
    from crank_tpu.bin.convert_stream import frame_mlfb, frame_window
    from crank_tpu.dsp.mel import mel_filterbank
    from crank_tpu.dsp.spectrum import logmelfilterbank
    from crank_tpu.dsp.windows import get_window

    fs, hop, fftl, wl, n_mels = 22050, 128, 512, 400, 24
    fc = {"fftl": fftl, "hop_size": hop, "win_length": wl, "fs": fs}
    rng = np.random.default_rng(5)
    x = rng.standard_normal(fs // 2)

    offline = logmelfilterbank(
        x, fs, hop_size=hop, fft_size=fftl, win_length=wl,
        window=get_window("hann", wl, periodic=False),
        num_mels=n_mels, fmin=80, fmax=7600,
    )
    basis = mel_filterbank(fs, fftl, n_mels, 80, 7600)
    win = frame_window(fc)
    n = (len(x) - fftl // 2) // hop
    streamed = np.concatenate([
        frame_mlfb(x[: t1 * hop + fftl // 2], t0, t1, fc, basis, win)
        for t0, t1 in ((i, min(i + 16, n)) for i in range(0, n, 16))
    ])
    np.testing.assert_allclose(streamed, offline[:n], rtol=1e-4, atol=1e-5)


def test_async_checkpoint_write_failure_surfaces(tmp_path):
    from crank_tpu.train.checkpoint import save_checkpoint, wait_pending

    state = {"steps": 1, "params": {}, "ema": {}, "opt": {},
             "rng": np.zeros(2, np.uint32)}
    save_checkpoint(tmp_path / "ok", state, async_write=True)
    wait_pending()
    # deterministic writer failure: a lambda survives _to_numpy as a 0-d
    # object array but cannot be pickled, so the background write raises
    bad_state = dict(state, steps=2, opt={"bad": (lambda: None)})
    p = save_checkpoint(tmp_path, bad_state, async_write=True)
    with pytest.raises(RuntimeError, match="NOT saved"):
        wait_pending()
    assert not p.exists()

def test_streaming_zero_variance_bin_finite(tiny_setup):
    """A constant (zero-variance) mlfb bin must not produce NaN: the
    jit-folded normalization uses StandardScaler.scale_ (zero-variance
    guard, features/scaler.py:22-27), matching the host transform path
    (review finding: sqrt(var_) divided by 0 here)."""
    conf, spkrs, _, models, params, ema = tiny_setup
    rng = np.random.default_rng(17)
    scaler = {"mlfb": StandardScaler(), "lcf0": StandardScaler()}
    for s, mu in (("SF1", 5.2), ("SM1", 4.6), ("TF2", 5.4)):
        lc = mu + 0.1 * rng.standard_normal((400, 1))
        scaler[s] = {"lcf0": StandardScaler().partial_fit(lc)}
        scaler["lcf0"].partial_fit(lc)
    feats = rng.standard_normal((400, conf["input_size"]))
    feats[:, -1] = -7.25  # constant bin (silence-floor mel band)
    scaler["mlfb"].partial_fit(feats)
    assert scaler["mlfb"].var_[-1] == 0.0

    conv = StreamingConverter(
        conf, len(spkrs), params["G"], ema, scaler, spkrs,
        org_spkr="SF1", cv_spkr="SM1", chunk_frames=CHUNK,
    )
    mlfb = rng.standard_normal((CHUNK, conf["input_size"])).astype(np.float32)
    mlfb[:, -1] = -7.25
    lcf0 = np.full((CHUNK, 1), 5.1, np.float32)
    uv = np.ones((CHUNK, 1), np.float32)
    out = conv.push(mlfb, lcf0, uv)
    assert np.all(np.isfinite(out["mlfb"]))
    assert np.all(np.isfinite(out["f0"]))


def test_chunk_gl_streaming_reconstruction():
    """The fused per-chunk Griffin-Lim (dsp/gl.make_chunk_gl) synthesizes
    coherent audio chunk-by-chunk: stream the log-mel of a harmonic tone
    through it, cross-fade the segments like the CLI consumer, and assert
    the re-analyzed mel of the output tracks the input mel."""
    from crank_tpu.dsp.gl import make_chunk_gl
    from crank_tpu.dsp.spectrum import logmelfilterbank

    fc = {"fs": 16000, "fftl": 512, "win_length": 512, "hop_size": 128,
          "mlfb_dim": 40, "fmin": 60, "fmax": 7600,
          "window_types": ["hann"]}
    fs, hop = fc["fs"], fc["hop_size"]
    t = np.arange(fs) / fs  # 1 s
    x = sum(a * np.sin(2 * np.pi * 220 * k * t)
            for k, a in enumerate([0.5, 0.25, 0.12], start=1))
    mel = logmelfilterbank(
        x, fs, hop_size=hop, fft_size=fc["fftl"], num_mels=fc["mlfb_dim"],
        fmin=fc["fmin"], fmax=fc["fmax"],
    ).astype(np.float32)

    Tc = 16
    n_chunks = mel.shape[0] // Tc
    fn, ctx = make_chunk_gl(fc, Tc, ctx_frames=16, n_iters=30)
    segs, prev_tail = [], None
    for i in range(n_chunks):
        seg, ctx = fn(ctx, jnp.asarray(mel[None, i * Tc:(i + 1) * Tc]))
        seg = np.asarray(seg)[0]
        s = seg[: Tc * hop].copy()
        if prev_tail is not None:
            ramp = np.linspace(0.0, 1.0, hop)
            s[:hop] = (1 - ramp) * prev_tail + ramp * s[:hop]
        prev_tail = seg[Tc * hop:]
        segs.append(s)
    y = np.concatenate(segs)
    assert np.all(np.isfinite(y)) and np.abs(y).max() > 1e-3

    mel_y = logmelfilterbank(
        y, fs, hop_size=hop, fft_size=fc["fftl"], num_mels=fc["mlfb_dim"],
        fmin=fc["fmin"], fmax=fc["fmax"],
    )
    # non-centered synthesis of center-analyzed mel delays the audio by
    # fftl/2 (= fftl//2//hop frames); search a small shift window
    n = min(mel_y.shape[0], n_chunks * Tc)
    best = -1.0
    for shift in range(0, 5):
        a = mel[Tc: n - Tc - shift]
        b = mel_y[Tc + shift: n - Tc]
        best = max(best, float(np.corrcoef(a.ravel(), b.ravel())[0, 1]))
    assert best > 0.9, f"re-analyzed mel decorrelated: best corr {best}"


def test_streaming_converter_device_gl(tiny_setup):
    """synth="gl" returns per-chunk waveform samples without perturbing
    the converted mel (identical to the synth="none" path)."""
    conf, spkrs, scaler, models, params, ema = tiny_setup
    hop = conf["feature"]["hop_size"]
    rng = np.random.default_rng(29)
    Tn = 32
    mlfb = rng.standard_normal((Tn, conf["input_size"])).astype(np.float32)
    lcf0 = (5.1 + 0.05 * rng.standard_normal((Tn, 1))).astype(np.float32)
    uv = np.ones((Tn, 1), np.float32)

    base = StreamingConverter(
        conf, len(spkrs), params["G"], ema, scaler, spkrs,
        org_spkr="SF1", cv_spkr="SM1", chunk_frames=CHUNK,
    )
    conv = StreamingConverter(
        conf, len(spkrs), params["G"], ema, scaler, spkrs,
        org_spkr="SF1", cv_spkr="SM1", chunk_frames=CHUNK,
        synth="gl", gl_ctx_frames=8, gl_iters=5,
    )
    for t in range(0, Tn, CHUNK):
        ref = base.push(mlfb[t:t + CHUNK], lcf0[t:t + CHUNK],
                        uv[t:t + CHUNK])
        out = conv.push(mlfb[t:t + CHUNK], lcf0[t:t + CHUNK],
                        uv[t:t + CHUNK])
        np.testing.assert_allclose(out["mlfb"], ref["mlfb"], atol=1e-5)
        assert out["wav"].shape == (1, CHUNK * hop)
        assert out["wav_tail"].shape == (1, hop)
        assert np.all(np.isfinite(out["wav"]))
    # reset restores both conv caches and the GL mel context
    conv.reset()
    out2 = conv.push(mlfb[:CHUNK], lcf0[:CHUNK], uv[:CHUNK])
    conv.reset()
    out3 = conv.push(mlfb[:CHUNK], lcf0[:CHUNK], uv[:CHUNK])
    np.testing.assert_allclose(out2["wav"], out3["wav"], atol=1e-6)
