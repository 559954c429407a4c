"""Griffin-Lim phase reconstruction as a fused XLA loop.

Replaces the reference's per-utterance CPU librosa.griffinlim calls
(crank/utils/utils.py:237-269) with a batched `lax.fori_loop` on device —
momentum-accelerated (fast) Griffin-Lim with random phase init, matching
librosa's algorithm (momentum=0.99). Frame counts are bucketed to bound the
number of compiled shapes.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from crank_tpu.dsp.mel import mel_pseudo_inverse
from crank_tpu.dsp.stft_jax import _istft_impl, _stft_impl, full_window

_WAV_MAX = 0.999969482421875  # int16 positive full-scale, as in the reference


@partial(
    jax.jit, static_argnames=("n_fft", "hop_size", "n_iters", "momentum")
)
def _griffin_lim_impl(S, win, key, *, n_fft, hop_size, n_iters, momentum):
    """S: magnitude [B, T, F]; returns waveform [B, hop_size*(T-1)]."""
    S = S.astype(jnp.float32)
    phase = jnp.exp(
        2j * jnp.pi * jax.random.uniform(key, S.shape, dtype=jnp.float32)
    )
    angles = S.astype(jnp.complex64) * phase
    beta = momentum / (1.0 + momentum)

    def body(_, carry):
        angles, rebuilt_prev = carry
        inverse = _istft_impl(
            angles, win, n_fft=n_fft, hop_size=hop_size, center=True, length=None
        )
        rebuilt = _stft_impl(
            inverse, win, n_fft=n_fft, hop_size=hop_size, center=True,
            pad_mode="reflect",
        )
        upd = rebuilt - beta * rebuilt_prev
        upd = upd / (jnp.abs(upd) + 1e-16)
        return S * upd, rebuilt

    angles, _ = jax.lax.fori_loop(
        0, n_iters, body, (angles, jnp.zeros_like(angles))
    )
    return _istft_impl(
        angles, win, n_fft=n_fft, hop_size=hop_size, center=True, length=None
    )


def griffin_lim(
    spc,
    n_fft=1024,
    hop_size=128,
    win_length=None,
    window="hann",
    n_iters=100,
    momentum=0.99,
    seed=0,
):
    """Reconstruct waveform(s) from linear magnitude spectrogram(s).

    spc: [T, F] or [B, T, F] magnitude (F = 1 + n_fft//2).
    Returns float32 waveform(s) clipped to [-1, ~1) like the reference
    (crank/utils/utils.py:258-268).
    """
    spc = jnp.asarray(spc)
    squeeze = spc.ndim == 2
    if squeeze:
        spc = spc[None]
    win_length = n_fft if win_length is None else win_length
    win = jnp.asarray(full_window(window, win_length, n_fft), dtype=jnp.float32)
    y = _griffin_lim_impl(
        jnp.abs(spc),
        win,
        jax.random.PRNGKey(seed),
        n_fft=n_fft,
        hop_size=hop_size,
        n_iters=n_iters,
        momentum=momentum,
    )
    y = jnp.clip(y, -1.0, _WAV_MAX)
    return np.asarray(y[0] if squeeze else y)


def _bucket_len(t: int, bucket: int = 128) -> int:
    return int(-(-t // bucket) * bucket)


def griffin_lim_np(spc, n_fft=1024, hop_size=128, win_length=None,
                   window="hann", n_iters=100, momentum=0.99, seed=0):
    """Numpy Griffin-Lim for host-side one-off jobs (e.g. feature-extraction
    check wavs inside short-lived worker processes, where a jit compile would
    dominate).  Same algorithm as the device path."""
    from crank_tpu.dsp.spectrum import stft_np, _pad_center
    from crank_tpu.dsp.windows import get_window

    spc = np.abs(np.asarray(spc, dtype=np.float64))  # [T, F]
    win_length = n_fft if win_length is None else win_length
    win = _pad_center(
        np.asarray(get_window(window, win_length, periodic=True)), n_fft
    )
    T = spc.shape[0]
    out_len = n_fft + hop_size * (T - 1)
    idx = hop_size * np.arange(T)[:, None] + np.arange(n_fft)[None, :]
    wss = np.zeros(out_len)
    np.add.at(wss, idx.reshape(-1), np.tile(win**2, T))
    wss = np.maximum(wss, 1e-10)

    def istft_np(S):
        frames = np.fft.irfft(S, n=n_fft, axis=-1) * win[None, :]
        y = np.zeros(out_len)
        np.add.at(y, idx.reshape(-1), frames.reshape(-1))
        return (y / wss)[n_fft // 2 : out_len - n_fft // 2]

    rng = np.random.default_rng(seed)
    angles = spc * np.exp(2j * np.pi * rng.random(spc.shape))
    beta = momentum / (1 + momentum)
    rebuilt_prev = np.zeros_like(angles)
    for _ in range(n_iters):
        inverse = istft_np(angles)
        rebuilt = stft_np(inverse, n_fft=n_fft, hop_size=hop_size,
                          win_length=None, window=win, center=True)
        upd = rebuilt - beta * rebuilt_prev
        rebuilt_prev = rebuilt
        angles = spc * upd / (np.abs(upd) + 1e-16)
    return np.clip(istft_np(angles), -1.0, _WAV_MAX)


def make_chunk_gl(feat_conf, chunk_frames, ctx_frames=32, n_iters=30,
                  batch=1):
    """Build a pure jittable per-chunk Griffin-Lim synthesizer.

    For the streaming conversion path (convert/streaming.py): fusing
    synthesis into the already-jitted chunk step keeps the whole pipeline
    at ONE device round trip per chunk — the previous demo synthesized
    each chunk with host-side numpy GL, which made the end-to-end CLI
    slower than real time (RTF 3.5 at 16-frame chunks) even though the
    model step itself ran at RTF 0.46.

    The synthesis math mirrors the host reference implementation it
    replaces (bin/convert_stream._gl_numpy): non-centered framing over a
    fixed window of ``ctx_frames`` trailing + ``chunk_frames`` new log-mel
    frames, plain (momentum-free) GL iterations, per-chunk-deterministic
    random phase init.

    Returns ``(fn, ctx0)`` where

    * ``fn(mel_ctx, log_mel_chunk) -> (wav_seg, new_ctx)`` — log10-mel
      chunk ``[B, T, D]`` (denormalized) in, waveform segment
      ``[B, T*hop + hop]`` out (the chunk's samples plus one extra hop for
      the caller's boundary cross-fade) along with the updated context;
      pure, safe to call inside an enclosing ``jax.jit``.
    * ``ctx0`` — the silence initial context ``[B, ctx_frames, D]``.
    """
    from crank_tpu.dsp.spectrum import EPS, _pad_center
    from crank_tpu.dsp.windows import get_window

    fs, fftl, hop = feat_conf["fs"], feat_conf["fftl"], feat_conf["hop_size"]
    n_mels = feat_conf["mlfb_dim"]
    B, T, C = int(batch), int(chunk_frames), int(ctx_frames)
    Tc = C + T
    L = (Tc - 1) * hop + fftl
    assert (C + T) * hop + hop <= L, "need 2*hop <= fftl for the tail slice"

    win_np = _pad_center(
        np.asarray(
            get_window(feat_conf.get("window_types", ["hann"])[0],
                       feat_conf.get("win_length", fftl), periodic=False)
        ),
        fftl,
    )
    inv_basis = mel_pseudo_inverse(fs, fftl, n_mels, feat_conf["fmin"],
                                   feat_conf["fmax"])
    idx_np = hop * np.arange(Tc)[:, None] + np.arange(fftl)[None, :]
    ola = np.zeros(L)
    np.add.at(ola, idx_np.reshape(-1), np.tile(win_np ** 2, Tc))
    ola = np.maximum(ola, 1e-8)

    win = jnp.asarray(win_np, jnp.float32)
    inv_t = jnp.asarray(inv_basis.T, jnp.float32)
    ola_j = jnp.asarray(ola, jnp.float32)
    idx = jnp.asarray(idx_np)

    def istft(S):
        frames = jnp.fft.irfft(S, n=fftl, axis=-1).astype(jnp.float32) * win
        y = jnp.zeros((B, L), jnp.float32)
        y = y.at[:, idx.reshape(-1)].add(frames.reshape(B, -1))
        return y / ola_j

    def stft(y):
        return jnp.fft.rfft(y[:, idx] * win, axis=-1)

    def fn(mel_ctx, log_mel_chunk):
        ctx = jnp.concatenate([mel_ctx, log_mel_chunk], axis=1)  # [B,Tc,D]
        spc = jnp.power(10.0, ctx) @ inv_t  # [B, Tc, F] magnitude
        phase = jnp.exp(
            2j
            * jnp.pi
            * jax.random.uniform(jax.random.PRNGKey(0), spc.shape,
                                 dtype=jnp.float32)
        )

        def body(_, ang):
            y = istft(spc.astype(jnp.complex64) * ang)
            s = stft(y)
            return s / (jnp.abs(s) + 1e-16)

        angles = jax.lax.fori_loop(0, n_iters, body, phase)
        y = istft(spc.astype(jnp.complex64) * angles)
        seg = y[:, C * hop: (C + T) * hop + hop]
        new_ctx = ctx[:, Tc - C:] if C > 0 else ctx[:, :0]
        return seg, new_ctx

    ctx0 = jnp.full((B, C, n_mels), jnp.float32(np.log10(EPS)))
    return fn, ctx0


def mlfb_to_wav(
    mlfb,
    fs=22050,
    n_mels=80,
    n_fft=1024,
    win_length=1024,
    hop_size=128,
    fmin=80,
    fmax=7600,
    window="hann",
    n_iters=100,
    bucket=128,
    backend="jax",
):
    """log-mel [T, n_mels] -> waveform via pinv(mel) + Griffin-Lim.

    Equivalent of the reference's mlfb2wav (crank/utils/utils.py:94-107).
    With the (default) jax backend the frame count is right-padded to a
    bucket multiple (single compiled shape per bucket) and the synthesized
    tail trimmed; backend="numpy" avoids compilation for one-off host jobs.
    """
    mlfb = np.asarray(mlfb)
    t_real = mlfb.shape[0]
    inv_basis = mel_pseudo_inverse(fs, n_fft, n_mels, fmin, fmax)
    mspc = np.power(10.0, mlfb)
    spc = mspc @ inv_basis.T
    if backend == "numpy":
        y = griffin_lim_np(
            np.abs(spc), n_fft=n_fft, hop_size=hop_size,
            win_length=win_length, window=window, n_iters=n_iters,
        )
        return np.asarray(y)[: hop_size * (t_real - 1)]
    t_pad = _bucket_len(max(t_real, 2), bucket)
    spc = np.pad(spc, ((0, t_pad - t_real), (0, 0)))
    y = griffin_lim(
        np.abs(spc),
        n_fft=n_fft,
        hop_size=hop_size,
        win_length=win_length,
        window=window,
        n_iters=n_iters,
    )
    return np.asarray(y)[: hop_size * (t_real - 1)]
