"""Streaming (low-latency) conversion CLI — simulated real-time over a wav.

Beyond-reference capability (the reference converts whole utterances
offline, crank/net/trainer/basetrainer.py:322-344).  Drives the causal
model chunk-by-chunk through crank_tpu.convert.StreamingConverter with a
causal host frontend:

* mel frames computed incrementally with the offline center/reflect
  convention — a frame is emitted once ``t*hop + fftl/2`` samples exist,
  so the frontend lookahead (fftl/2 samples) is part of the reported
  algorithmic latency;
* F0 tracked per chunk by the native analyzer over a trailing context
  window (strictly causal — no future audio), with zero-order-hold
  continuous F0 across unvoiced gaps (convert/streaming.py);
* optional per-chunk Griffin-Lim synthesis with trailing mel context and
  cross-faded overlap-add (a documented quality-vs-latency tradeoff; use
  the offline stage-6 synthesis for best quality).

Prints one JSON line with latency percentiles and the real-time factor.

Usage:
  python -m crank_tpu.bin.convert_stream --conf conf/mlfb_vqvae.yml \
      --checkpoint exp/.../checkpoint_200000steps.pkl \
      --scpdir data/scp --featdir data/feature \
      --wav in.wav --org_spkr SF1 --cv_spkr TM1 --out out.wav
"""

import argparse
import json
import logging
import sys
import time
from pathlib import Path

import numpy as np


def frame_window(fc):
    """The exact analysis window the offline extractor uses: symmetric
    window of win_length (features/extractor.py:59-64, periodic=False),
    center-padded to fftl (dsp/spectrum.stft_np)."""
    from crank_tpu.dsp.spectrum import _pad_center
    from crank_tpu.dsp.windows import get_window

    win = get_window("hann", fc.get("win_length", fc["fftl"]),
                     periodic=False)
    return _pad_center(win, fc["fftl"])


def frame_mlfb(buf, t0, t1, fc, mel_basis, win):
    """Frames [t0, t1) of the center/reflect mel spectrogram of ``buf``.

    Reproduces dsp/spectrum.logmelfilterbank exactly (same window via
    :func:`frame_window`, same reflect convention, same eps) for any frame
    whose centered window fits in the buffered past + fftl/2 lookahead
    (start-of-stream reflect padding uses the real buffered samples).
    """
    from crank_tpu.dsp.spectrum import EPS

    fftl, hop = fc["fftl"], fc["hop_size"]
    half = fftl // 2
    frames = []
    for t in range(t0, t1):
        c = t * hop
        lo, hi = c - half, c + half
        seg = buf[max(0, lo) : hi]
        if lo < 0:  # start-of-stream reflect padding (offline parity)
            seg = np.concatenate([buf[1 : 1 - lo][::-1], seg])
        frames.append(seg)
    spc = np.abs(np.fft.rfft(np.stack(frames) * win[None, :], axis=-1))
    return np.log10(np.maximum(EPS, spc @ mel_basis.T)).astype(np.float32)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--conf", type=Path, required=True)
    parser.add_argument("--checkpoint", type=Path, required=True)
    parser.add_argument("--scpdir", type=Path, required=True)
    parser.add_argument("--featdir", type=Path, required=True)
    parser.add_argument("--wav", type=Path, required=True)
    parser.add_argument("--org_spkr", type=str, required=True)
    parser.add_argument("--cv_spkr", type=str, required=True)
    parser.add_argument("--spkr_yml", type=Path, default=None,
                        help="per-speaker f0 ranges for the F0 tracker")
    parser.add_argument("--out", type=Path, default=None,
                        help="output wav (requires --synth gl/gl_device/npwg)")
    parser.add_argument(
        "--synth", choices=["none", "gl", "gl_device", "npwg"],
        default="gl_device",
        help="per-chunk synthesis: gl_device (default) fuses Griffin-Lim "
             "into the jitted chunk step (one device round trip per chunk, "
             "real-time end to end); npwg fuses the causal streaming "
             "neural vocoder instead (requires --voc_checkpoint trained "
             "with vocoder: {causal: true} — continuous across chunks, "
             "no cross-fade, NPWG quality); gl is the host-side numpy "
             "fallback",
    )
    parser.add_argument(
        "--voc_checkpoint", type=Path, default=None,
        help="causal vocoder checkpoint for --synth npwg",
    )
    parser.add_argument("--chunk_frames", type=int, default=32)
    parser.add_argument("--f0_ctx_ms", type=float, default=400.0)
    parser.add_argument("--gl_ctx_frames", type=int, default=32)
    parser.add_argument("--gl_iters", type=int, default=30)
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO, stream=sys.stdout)

    import yaml

    from crank_tpu.convert.streaming import (
        StreamingConverter,
        causal_hold_continuous_f0,
    )
    from crank_tpu.dsp.mel import mel_filterbank, mel_pseudo_inverse
    from crank_tpu.features.scaler import load_scaler
    from crank_tpu.native import world
    from crank_tpu.train.checkpoint import load_checkpoint
    from crank_tpu.utils.audio_io import read_wav, write_wav
    from crank_tpu.utils.config import load_yaml
    from crank_tpu.utils.scp import open_scpdir

    import os

    default_yml = None
    if not (os.environ.get("CRANK_TPU_DEFAULT_YAML")
            or os.environ.get("CRANK_DEFAULT_YAML")):
        cand = args.conf.parent / "default.yml"
        default_yml = cand if cand.exists() else None
    conf = load_yaml(args.conf, default_ymlf=default_yml)
    fc = conf["feature"]
    fs, hop, fftl = fc["fs"], fc["hop_size"], fc["fftl"]
    scp = open_scpdir(args.scpdir / "train")
    spkrs = {s: i for i, s in enumerate(scp["spkrs"])}
    scaler = load_scaler(args.featdir / fc["label"] / "scaler.pkl")
    ckpt = load_checkpoint(args.checkpoint)

    minf0, maxf0 = 40.0, 700.0
    if args.spkr_yml is not None:
        with open(args.spkr_yml) as fp:
            spkr_conf = yaml.safe_load(fp)
        if args.org_spkr in spkr_conf:
            minf0 = float(spkr_conf[args.org_spkr].get("minf0", minf0))
            maxf0 = float(spkr_conf[args.org_spkr].get("maxf0", maxf0))

    voc_conf, voc_params = None, None
    if args.synth == "npwg":
        if args.voc_checkpoint is None:
            raise SystemExit("--synth npwg requires --voc_checkpoint")
        from crank_tpu.vocoder.train import aux_channels_for

        voc_conf = dict(conf.get("vocoder", {}))
        voc_conf.setdefault("aux_channels", aux_channels_for(conf))
        voc_conf.setdefault("causal", True)
        voc_params = load_checkpoint(args.voc_checkpoint)["params"]["G"]
        logging.info("streaming synthesis: causal NPWG from %s",
                     args.voc_checkpoint)

    synth_mode = {"gl_device": "gl", "npwg": "npwg"}.get(args.synth, "none")
    conv = StreamingConverter(
        conf, len(spkrs), ckpt["params"]["G"], ckpt.get("ema"), scaler,
        spkrs, args.org_spkr, args.cv_spkr, chunk_frames=args.chunk_frames,
        synth=synth_mode,
        gl_ctx_frames=args.gl_ctx_frames, gl_iters=args.gl_iters,
        voc_conf=voc_conf, voc_params=voc_params,
    )

    x, fs_in = read_wav(args.wav)
    if fs_in != fs:
        raise SystemExit(f"wav fs {fs_in} != conf fs {fs}")
    x = np.asarray(x, np.float64)

    mel_basis = mel_filterbank(fs, fftl, fc["mlfb_dim"], fc["fmin"],
                               fc["fmax"])
    win = frame_window(fc)  # offline-extractor window (symmetric, padded)
    inv_basis = mel_pseudo_inverse(fs, fftl, fc["mlfb_dim"], fc["fmin"],
                                   fc["fmax"])

    chunk = args.chunk_frames
    half = fftl // 2
    f0_ctx = int(args.f0_ctx_ms / 1000.0 * fs) // hop * hop
    # the F0 analyzer runs on the WORLD shiftms grid, which may differ from
    # the mel hop grid — map mel frame t to F0 frame round(t*hop / f0_hop)
    f0_hop = fs * fc["shiftms"] / 1000.0  # samples per F0 frame (float)

    # warm up the jitted chunk step (compile outside the timed loop)
    conv.push(
        np.zeros((chunk, fc["mlfb_dim"]), np.float32),
        np.full((chunk, 1), 5.0, np.float32),
        np.zeros((chunk, 1), np.float32),
    )
    conv.reset()

    org_lcf0_mean = float(np.asarray(scaler[args.org_spkr]["lcf0"].mean_)[0])
    held_f0 = float(np.exp(org_lcf0_mean))
    out_mels, dispatch_lat = [], []
    emitted = 0  # frames fed to the converter so far

    # Pipelined consumer: the main loop only runs the host frontend and
    # DISPATCHES the jitted chunk step (push_async); a worker thread
    # fetches the device result (one transfer round trip — the dominant
    # per-chunk cost on tunneled/remote devices) and, for --synth gl,
    # synthesizes.  Chunk k's readback+synthesis overlaps chunk k+1's
    # frontend+model step.
    import queue as _queue
    import threading

    # bounded: if the consumer (readback + GL synthesis) falls behind, the
    # producer blocks instead of accumulating unbounded in-flight device
    # buffers + host tuples over a long stream (O(1) memory, like the old
    # synchronous loop, while keeping the one-chunk overlap)
    work_q = _queue.Queue(maxsize=4)
    cons = {"out": [], "busy": 0.0, "backlog_max": 0, "error": None,
            "latencies": [], "done_t": None}

    def _consumer():
        try:
            _consume_loop()
        except BaseException as e:  # surfaced in the main thread after join
            cons["error"] = e

    def _consume_loop():
        mel_ctx = None  # trailing converted-mel context for per-chunk GL
        prev_tail = None  # last synthesized samples for the cross-fade
        while True:
            item = work_q.get()
            if item is None:
                cons["done_t"] = time.perf_counter()
                return
            r, packed, t_arrive = item
            tw = time.perf_counter()
            ret = conv.fetch(packed)
            cv_mel = ret["mlfb"][0][:r]
            out_mels.append(cv_mel)
            if args.synth == "npwg":
                # fused neural-vocoder synthesis: the WaveNet output is
                # continuous across chunk boundaries — append as-is
                cons["out"].append(ret["wav"][0][: r * hop].copy())
            elif args.synth == "gl_device":
                # synthesis already happened on device inside the chunk
                # step; the host only cross-fades one hop at the boundary
                wav_flat = np.concatenate(
                    [ret["wav"][0], ret["wav_tail"][0]]
                )
                seg = wav_flat[: r * hop].copy()
                if prev_tail is not None:
                    ramp = np.linspace(0.0, 1.0, hop)
                    seg[:hop] = (1 - ramp) * prev_tail + ramp * seg[:hop]
                prev_tail = wav_flat[r * hop: r * hop + hop]
                prev_tail = None if len(prev_tail) < hop else prev_tail
                cons["out"].append(seg)
            elif args.synth == "gl":
                ctx = (
                    cv_mel
                    if mel_ctx is None
                    else np.concatenate([mel_ctx, cv_mel], axis=0)
                )
                n_ctx = ctx.shape[0] - r
                spc = np.power(10.0, ctx) @ inv_basis.T
                wav_seg = _gl_numpy(spc, fftl, hop, win, args.gl_iters)
                seg = wav_seg[n_ctx * hop : (n_ctx + r) * hop].copy()
                if prev_tail is not None:  # one-hop boundary cross-fade
                    ramp = np.linspace(0.0, 1.0, hop)
                    seg[:hop] = (1 - ramp) * prev_tail + ramp * seg[:hop]
                prev_tail = wav_seg[(n_ctx + r) * hop :][:hop]
                prev_tail = None if len(prev_tail) < hop else prev_tail
                cons["out"].append(seg)
                # n=0 must mean "no context" — ctx[-0:] would keep the
                # whole history and make per-chunk GL cost grow unbounded
                n_keep = args.gl_ctx_frames
                mel_ctx = ctx[-n_keep:] if n_keep > 0 else ctx[:0]
            cons["latencies"].append(time.perf_counter() - t_arrive)
            cons["busy"] += time.perf_counter() - tw

    worker = threading.Thread(target=_consumer, daemon=True)
    worker.start()

    # stream the audio in chunk-sized hops; each iteration simulates the
    # arrival of chunk*hop new samples.  The trailing partial chunk is
    # pushed zero-padded and trimmed, so no input frames are dropped.
    n_total = (len(x) - half) // hop  # frames whose lookahead is available
    if n_total < 1:
        raise SystemExit(
            f"input too short: need at least {hop + half} samples "
            f"({(hop + half) / fs * 1000:.0f} ms) of audio, got {len(x)}"
        )
    t_start = time.perf_counter()
    for t0 in range(0, n_total, chunk):
        if cons["error"] is not None:
            # fail fast: a dead consumer stops draining the queue, and a
            # long input would otherwise pay frontend + dispatch work for
            # every remaining chunk before the post-join error surfaces
            break
        t_arrive = time.perf_counter()
        t1 = min(t0 + chunk, n_total)
        r = t1 - t0  # valid frames in this (possibly final partial) chunk
        buf = x[: t1 * hop + half]

        mlfb = frame_mlfb(buf, t0, t1, fc, mel_basis, win)
        if r < chunk:
            mlfb = np.pad(mlfb, ((0, chunk - r), (0, 0)))

        # causal F0: analyze the trailing context ending at the newest
        # sample (never starting after the chunk itself)
        s0 = max(0, min(t1 * hop + half - f0_ctx - fftl, t0 * hop))
        s0 = (s0 // hop) * hop
        f0_win = world.f0_analyze(
            np.ascontiguousarray(buf[s0:]), fs,
            shiftms=fc["shiftms"], minf0=minf0, maxf0=maxf0,
        )
        f0_chunk = np.zeros(chunk)
        for i in range(r):  # mel frame -> F0 frame on the shiftms grid
            j = int(round(((t0 + i) * hop - s0) / f0_hop))
            if 0 <= j < len(f0_win):
                f0_chunk[i] = f0_win[j]
        uv, cont_f0, held_f0 = causal_hold_continuous_f0(
            f0_chunk, prev_value=held_f0
        )
        lcf0 = np.log(np.maximum(cont_f0, 1e-10)).astype(np.float32)

        packed = conv.push_async(
            mlfb[None], lcf0[None, :, None], uv[None, :, None]
        )
        cons["backlog_max"] = max(cons["backlog_max"], work_q.qsize())
        work_q.put((r, packed, t_arrive))

        dispatch_lat.append(time.perf_counter() - t_arrive)
        emitted = t1

    work_q.put(None)
    worker.join()
    if cons["error"] is not None:
        raise RuntimeError(
            "stream consumer failed mid-stream"
        ) from cons["error"]
    wall_s = cons["done_t"] - t_start
    out_wavs = cons["out"]

    disp = np.asarray(dispatch_lat)
    lat = np.asarray(cons["latencies"])
    chunk_s = chunk * hop / fs
    stream_s = emitted * hop / fs
    algo_latency_s = chunk_s + half / fs
    # rtf is the sustained whole-pipeline rate (frontend + dispatch +
    # model + readback + synthesis, overlapped): wall time to consume the
    # whole stream over its audio duration.  chunk_latency covers
    # arrival -> mel (and wav, for --synth gl) but is queue-inflated in
    # this harness because chunks arrive as fast as they are dispatched
    # rather than paced in real time.
    result = {
        "metric": "streaming_conversion",
        "frames": int(emitted),
        "chunk_frames": chunk,
        "chunk_ms": round(chunk_s * 1000, 2),
        "algorithmic_latency_ms": round(algo_latency_s * 1000, 2),
        "dispatch_ms_mean": round(float(disp.mean()) * 1000, 2),
        "chunk_latency_ms_mean": round(float(lat.mean()) * 1000, 2),
        "chunk_latency_ms_p95": round(
            float(np.percentile(lat, 95)) * 1000, 2
        ),
        "rtf": round(wall_s / stream_s, 4),
        "real_time_capable": bool(wall_s / stream_s < 1.0),
        "consumer_rtf": round(cons["busy"] / stream_s, 4),
        "backlog_max": cons["backlog_max"],
    }
    if (args.synth in ("gl", "gl_device", "npwg") and args.out is not None
            and out_wavs):
        wav = np.concatenate(out_wavs)
        peak = np.abs(wav).max()
        if peak > 1.0:
            wav = wav / peak * 0.95
        args.out.parent.mkdir(parents=True, exist_ok=True)
        write_wav(args.out, wav, fs)
        result["out"] = str(args.out)
    if out_mels:
        result["mel_frames_out"] = int(sum(m.shape[0] for m in out_mels))
    print(json.dumps(result))


def _gl_numpy(spc, n_fft, hop, win, n_iters):
    """Small host-side Griffin-Lim for per-chunk synthesis (numpy; the
    heavy offline path is the batched jax one in dsp/gl.py)."""
    rng = np.random.default_rng(0)
    angles = np.exp(2j * np.pi * rng.random(spc.shape))
    ola_win = _ola_norm(win, spc.shape[0], hop, n_fft)

    def istft(stft_m):
        frames = np.fft.irfft(stft_m, n=n_fft, axis=-1) * win[None, :]
        y = np.zeros((spc.shape[0] - 1) * hop + n_fft)
        for t in range(spc.shape[0]):
            y[t * hop : t * hop + n_fft] += frames[t]
        return y / ola_win

    def stft(y):
        idx = (
            np.arange(n_fft)[None, :]
            + hop * np.arange(spc.shape[0])[:, None]
        )
        return np.fft.rfft(y[idx] * win[None, :], axis=-1)

    for _ in range(n_iters):
        y = istft(spc * angles)
        s = stft(y)
        angles = np.exp(1j * np.angle(s))
    return istft(spc * angles)


def _ola_norm(win, n_frames, hop, n_fft):
    acc = np.zeros((n_frames - 1) * hop + n_fft)
    w2 = win**2
    for t in range(n_frames):
        acc[t * hop : t * hop + n_fft] += w2
    return np.maximum(acc, 1e-8)


if __name__ == "__main__":
    main()
