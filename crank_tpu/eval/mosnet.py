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
    def __call__(self, x):
        x = nn.Conv(self.ch, (3, 3), strides=(1, 1), padding="SAME")(x)
        x = nn.relu(x)
        x = nn.Conv(self.ch, (3, 3), strides=(1, 1), padding="SAME")(x)
        x = nn.relu(x)
        x = nn.Conv(self.ch, (3, 3), strides=(1, 3), padding="SAME")(x)
        x = nn.relu(x)
        return x


class MOSNet(nn.Module):
    @nn.compact
    def __call__(self, mag):
        """mag: [B, T, 257] magnitude spectrogram -> (avg_score [B],
        frame_scores [B, T])."""
        x = mag[..., None]
        for ch in (16, 32, 64, 128):
            x = ConvBlock(ch)(x)
        B, T = x.shape[0], x.shape[1]
        x = x.reshape(B, T, -1)  # [B, T, 4*128]
        lstm_fwd = nn.RNN(nn.OptimizedLSTMCell(128))
        lstm_bwd = nn.RNN(nn.OptimizedLSTMCell(128), reverse=True,
                          keep_order=True)
        x = jnp.concatenate([lstm_fwd(x), lstm_bwd(x)], axis=-1)
        x = nn.relu(nn.Dense(128)(x))
        x = nn.Dropout(0.3, deterministic=True)(x)
        frame = nn.Dense(1)(x)[..., 0]
        return jnp.mean(frame, axis=1), frame


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
            self.params = self.model.init(jax.random.PRNGKey(0), dummy)[
                "params"
            ]
        self._fwd = jax.jit(
            lambda p, m: self.model.apply({"params": p}, m)[0]
        )

    def predict_wav(self, x, fs):
        if fs != FS:
            # linear resample to 16 kHz (MOSnet's expected rate)
            n_out = int(len(x) * FS / fs)
            x = np.interp(
                np.linspace(0, len(x) - 1, n_out), np.arange(len(x)), x
            )
        mag = np.abs(stft_np(x, n_fft=FFTL, hop_size=HOP, window="hann"))
        # pad frames to a multiple of 27 (the conv stack's 3^3 freq stride
        # needs no length padding; time bucketing bounds recompiles)
        t = mag.shape[0]
        t_pad = -(-t // 64) * 64
        mag = np.pad(mag, ((0, t_pad - t), (0, 0)))
        score = self._fwd(self.params, jnp.asarray(mag[None], jnp.float32))
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
