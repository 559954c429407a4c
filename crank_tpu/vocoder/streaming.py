"""Chunk-synchronous neural-vocoder synthesis (streaming NPWG).

Beyond-reference capability: the reference's vocoder stage is offline
batch decoding through the external parallel_wavegan package
(egs/vaevc/template/run.sh:211-229); it has no streaming mode.  A
*causal* PWGVocoder checkpoint (``vocoder: {causal: true}``) can be
driven chunk-by-chunk here: every conv carries its left context in a
flax ``"cache"`` ring buffer (models/layers.py Conv1d), so per-chunk
synthesis is bit-identical to one offline causal pass — constant memory,
algorithmic latency = one mel chunk, no overlap-add or cross-fade needed
(the WaveNet output is continuous across chunk boundaries by
construction, unlike per-chunk Griffin-Lim).

The per-chunk noise input is derived deterministically from
``fold_in(PRNGKey(seed), chunk_index)`` so a stream is reproducible and
an offline forward fed the concatenated per-chunk noise is exactly
equal to the streamed output (asserted in tests/test_vocoder_stream.py).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from crank_tpu.vocoder.model import PWGVocoder


def build_streaming_vocoder(
    voc_conf: dict, chunk_frames: int, batch: int = 1
) -> Tuple[PWGVocoder, dict]:
    """Construct the streaming-mode causal vocoder and its zeroed cache.

    ``voc_conf`` is the recipe's ``vocoder:`` block (VocoderTrainer
    DEFAULTS semantics).  Returns (model, cache0) where cache0 holds the
    start-of-stream (all-zeros == offline causal zero-padding) conv
    states for ``[batch, chunk_frames]``-shaped chunks.
    """
    from crank_tpu.vocoder.train import DEFAULTS

    c = {**DEFAULTS, **voc_conf}
    if not c.get("causal"):
        raise ValueError(
            "streaming synthesis requires a causal vocoder checkpoint "
            "(train with vocoder: {causal: true})"
        )
    model = PWGVocoder(
        layers=c["layers"],
        stacks=c["stacks"],
        aux_channels=c.get("aux_channels", 80),
        upsample_strides=tuple(c["upsample_strides"]),
        causal=True,
        streaming=True,
    )
    hop = model.hop_size
    z0 = jnp.zeros((batch, chunk_frames * hop), jnp.float32)
    c0 = jnp.zeros((batch, chunk_frames, c.get("aux_channels", 80)),
                   jnp.float32)
    from crank_tpu.train.factory import jit_init

    variables = jit_init(model, jax.random.PRNGKey(0), z0, c0)
    cache0 = jax.tree_util.tree_map(jnp.zeros_like, variables["cache"])
    return model, cache0


class StreamingVocoder:
    """Stateful chunk-by-chunk synthesis for a trained causal vocoder.

    >>> voc = StreamingVocoder(voc_conf, ckpt["params"]["G"], chunk_frames=8)
    >>> wav_chunk = voc.push(mel_chunk)        # [T, aux] -> [T * hop]

    For the fused single-round-trip path (VC model + vocoder in ONE
    jitted chunk step) use convert.streaming.StreamingConverter with
    ``synth="npwg"`` instead; this class is the standalone vocoder-only
    driver (e.g. vocoding an existing mel stream).
    """

    def __init__(self, voc_conf, params, chunk_frames: int = 32,
                 batch: int = 1, seed: int = 0):
        self.chunk_frames = int(chunk_frames)
        self.batch = int(batch)
        self.model, self._cache0 = build_streaming_vocoder(
            voc_conf, self.chunk_frames, self.batch
        )
        self.hop = self.model.hop_size
        self.cache = self._cache0
        self._params = params
        self._base_key = jax.random.PRNGKey(seed)
        self._ctr = jnp.zeros((), jnp.int32)
        model, B, T, hop = self.model, self.batch, self.chunk_frames, self.hop
        base_key = self._base_key

        @jax.jit
        def _step(params, cache, ctr, mel, z):
            if z is None:
                z = jax.random.normal(
                    jax.random.fold_in(base_key, ctr), (B, T * hop)
                )
            wav, newv = model.apply(
                {"params": params, "cache": cache}, z, mel,
                mutable=["cache"],
            )
            return wav, newv["cache"], ctr + 1

        self._step = _step

    def reset(self):
        """Start a new stream (clears conv states and the noise counter)."""
        self.cache = self._cache0
        self._ctr = jnp.zeros((), jnp.int32)

    def push(self, mel: np.ndarray, z: Optional[np.ndarray] = None):
        """Synthesize one chunk.

        mel: ``[T, aux]`` or ``[B, T, aux]`` with ``T == chunk_frames``.
        z: optional explicit noise ``[B, T*hop]`` (default: the
        deterministic per-chunk fold_in stream).  Returns ``[B, T*hop]``.
        """
        mel = np.asarray(mel, np.float32)
        if mel.ndim == 2:
            mel = mel[None]
        if mel.shape[1] != self.chunk_frames:
            raise ValueError(
                f"chunk must be exactly {self.chunk_frames} frames "
                f"(got {mel.shape[1]}); pad the final chunk"
            )
        wav, self.cache, self._ctr = self._step(
            self._params, self.cache, self._ctr, mel, z
        )
        return np.asarray(wav)

    def noise_for_chunks(self, n_chunks: int) -> np.ndarray:
        """The deterministic noise the stream will use for the next
        ``n_chunks`` chunks, concatenated ``[B, n_chunks*T*hop]`` — feed
        this to an offline causal forward to reproduce the stream."""
        start = int(self._ctr)
        zs = [
            jax.random.normal(
                jax.random.fold_in(self._base_key, start + i),
                (self.batch, self.chunk_frames * self.hop),
            )
            for i in range(n_chunks)
        ]
        return np.concatenate([np.asarray(z) for z in zs], axis=1)
