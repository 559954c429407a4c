"""MOSnet objective quality predictor (JAX).

Role parity with the reference's speechmetrics/TensorFlow MOSnet
(crank/bin/evaluate_mosnet.py): CNN-BLSTM over 257-bin magnitude spectrogram
frames (16 kHz, fft 512, hop 256), predicting a per-frame MOS averaged to an
utterance score (MOSNet, Lo et al., Interspeech 2019 architecture).

Pretrained weights are NOT vendored (this environment has no network egress
and the upstream license gates redistribution); `load_params` accepts a
converted .npz of the published checkpoint.  Without weights the model can be
used with random init for pipeline tests only — scores are then meaningless
and `predict` warns.
"""

import logging
from pathlib import Path

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from crank_tpu.dsp.spectrum import stft_np

FS = 16000
FFTL = 512
HOP = 256


class ConvBlock(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x, mask):
        """mask [B, T]: padded frames are re-zeroed after every conv — bias +
        relu would otherwise light them up and leak into valid boundary
        frames through the next conv's time window."""
        m = mask[..., None, None]
        for strides in ((1, 1), (1, 1), (1, 3)):
            x = nn.Conv(self.ch, (3, 3), strides=strides, padding="SAME")(x)
            x = nn.relu(x) * m
        return x


class MOSNet(nn.Module):
    @nn.compact
    def __call__(self, mag, lengths=None):
        """mag: [B, T, 257] magnitude spectrogram (possibly zero-padded to a
        time bucket), lengths: [B] true frame counts -> (avg_score [B],
        frame_scores [B, T]).

        The average is over the true ``lengths`` only, and the backward LSTM
        reverses within each valid region (``seq_lengths``), so bucketed
        zero-padding cannot bias the score (scores would otherwise depend on
        utterance length mod bucket)."""
        B, T = mag.shape[0], mag.shape[1]
        if lengths is None:
            lengths = jnp.full((B,), T, dtype=jnp.int32)
        mask = jnp.arange(T)[None, :] < lengths[:, None]  # [B, T]
        x = mag[..., None]
        for ch in (16, 32, 64, 128):
            x = ConvBlock(ch)(x, mask)
        x = x.reshape(B, T, -1)  # [B, T, 4*128]
        lstm_fwd = nn.RNN(nn.OptimizedLSTMCell(128))
        lstm_bwd = nn.RNN(nn.OptimizedLSTMCell(128), reverse=True,
                          keep_order=True)
        x = jnp.concatenate(
            [lstm_fwd(x), lstm_bwd(x, seq_lengths=lengths)], axis=-1
        )
        x = nn.relu(nn.Dense(128)(x))
        x = nn.Dropout(0.3, deterministic=True)(x)
        frame = nn.Dense(1)(x)[..., 0]
        avg = jnp.sum(frame * mask, axis=1) / jnp.maximum(lengths, 1)
        return avg, frame


class MOSNetPredictor:
    def __init__(self, weights=None):
        self.model = MOSNet()
        self._rand = weights is None
        if weights is not None:
            self.params = load_params(weights)
        else:
            logging.warning(
                "MOSnet weights not provided — using random init; scores are "
                "NOT meaningful. Convert the published MOSNet checkpoint to "
                ".npz and pass its path."
            )
            dummy = jnp.zeros((1, 16, 257))
            from crank_tpu.train.factory import jit_init

            self.params = jit_init(self.model, jax.random.PRNGKey(0), dummy)[
                "params"
            ]
        self._fwd = jax.jit(
            lambda p, m, n: self.model.apply({"params": p}, m, lengths=n)[0]
        )

    def predict_wav(self, x, fs):
        if fs != FS:
            # polyphase resample to 16 kHz (MOSnet's expected rate) — a
            # plain linear interp would alias 8-11 kHz content into the
            # scored band and bias MOS vs the reference's librosa path
            from fractions import Fraction

            from scipy.signal import resample_poly

            fr = Fraction(FS, int(fs)).limit_denominator(1000)
            x = resample_poly(np.asarray(x, np.float64), fr.numerator,
                              fr.denominator)
        mag = np.abs(stft_np(x, n_fft=FFTL, hop_size=HOP, window="hann"))
        # time bucketing bounds recompiles; the true frame count is passed so
        # padding cannot bias the score (masked mean + seq_lengths reverse)
        t = mag.shape[0]
        t_pad = -(-t // 64) * 64
        mag = np.pad(mag, ((0, t_pad - t), (0, 0)))
        score = self._fwd(self.params, jnp.asarray(mag[None], jnp.float32),
                          jnp.asarray([t], jnp.int32))
        return float(np.asarray(score)[0])


def load_params(path):
    """Load MOSNet params from an .npz produced by flax serialization."""
    import pickle

    path = Path(path)
    if path.suffix == ".npz":
        flat = dict(np.load(path, allow_pickle=True))
        from flax.traverse_util import unflatten_dict

        return unflatten_dict(
            {tuple(k.split("/")): v for k, v in flat.items()}
        )
    with open(path, "rb") as fp:
        return pickle.load(fp)
