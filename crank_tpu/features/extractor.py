"""Offline per-utterance acoustic feature extraction.

Capability-parity with the reference Feature class (crank/feature/feature.py):
WAV read + 70 Hz low-cut, log-mel filterbanks per window type, WORLD-style
analysis (F0 / spectral envelope / aperiodicity via the first-party C++
vocoder in crank_tpu/native), uv / continuous-F0 / log-F0, mel-cepstrum,
normalized power, (continuous) coded aperiodicity, and optional Griffin-Lim /
analysis-synthesis sanity wavs.
"""

import logging
from pathlib import Path

import numpy as np

from crank_tpu.dsp.f0_utils import convert_continuous_f0
from crank_tpu.dsp.filters import low_cut_filter
from crank_tpu.dsp.spectrum import logmelfilterbank
from crank_tpu.dsp.windows import get_window
from crank_tpu.features.store import write_features
from crank_tpu.utils.audio_io import read_wav, write_wav

EPS = 1e-10


class FeatureExtractor:
    def __init__(self, h5_dir, conf, spkr_conf):
        self.h5_dir = Path(h5_dir)
        self.conf = conf
        self.sconf = spkr_conf
        self.windows = self._generate_windows()

    def analyze(self, wavf, synth_flag=False):
        fs, x, flbl = self._open_wavf(wavf)
        assert fs == self.conf["fs"], f"{fs} != {self.conf['fs']}"
        h5f = self.h5_dir / (flbl + ".h5")
        if h5f.exists():
            logging.info("h5 file already exists: %s", h5f)
            return h5f
        logging.info("extract: %s", wavf)
        feats = {}
        self._analyze_mlfb(wavf, feats)
        if synth_flag:
            self._mlfb2wavf(flbl, feats)
        self._analyze_world(x, feats)
        # the mcep presence check fixes a latent reference crash: at e.g.
        # fs=16000 the reference's synth gate (fs != 8000, feature.py:51)
        # passes while its mcep gate (fs > 16000, :92) does not, and
        # synthesis then KeyErrors on the missing mcep
        if (synth_flag and self.conf["fftl"] != 256
                and self.conf["fs"] != 8000 and "mcep" in feats):
            self._synthesize_world(flbl, feats)
        write_features(h5f, feats)
        return h5f

    # ------------------------------------------------------------------ #

    def _open_wavf(self, wavf):
        flbl = Path(wavf).stem
        x, fs = read_wav(wavf)
        x = low_cut_filter(x, fs, cutoff=70)
        return fs, x, flbl

    def _generate_windows(self):
        assert "hann" in self.conf["window_types"]
        return {
            wt: get_window(wt, self.conf["win_length"], periodic=False)
            for wt in self.conf["window_types"]
        }

    def _analyze_mlfb(self, wavf, feats):
        raw, fs = read_wav(wavf)
        feats["raw"] = raw
        for win_type, win in self.windows.items():
            name = "mlfb" if win_type == "hann" else f"mlfb_{win_type}"
            feats[name] = logmelfilterbank(
                raw,
                self.conf["fs"],
                hop_size=self.conf["hop_size"],
                fft_size=self.conf["fftl"],
                win_length=self.conf["win_length"],
                window=win,
                num_mels=self.conf["mlfb_dim"],
                fmin=self.conf["fmin"],
                fmax=self.conf["fmax"],
                eps=EPS,
            )

    def _analyze_world(self, x, feats, f0_only=False):
        from crank_tpu.native import world

        f0, spc, ap = world.analyze(
            x,
            fs=self.conf["fs"],
            fftl=self.conf["fftl"],
            shiftms=self.conf["shiftms"],
            minf0=self.sconf["minf0"],
            maxf0=self.sconf["maxf0"],
        )
        feats["f0"], feats["spc"], feats["ap"] = f0, spc, ap
        feats["uv"], feats["cf0"] = convert_continuous_f0(f0)
        feats["lf0"] = np.log(f0 + EPS)
        feats["lcf0"] = np.log(feats["cf0"])
        if f0_only:
            return
        if self.conf["fftl"] != 256 and self.conf["fs"] > 16000:
            feats["mcep"] = world.sp2mc(
                spc, dim=self.conf["mcep_dim"], alpha=self.conf["mcep_alpha"]
            )
            feats["npow"] = world.spc2npow(spc)
            cap = world.code_aperiodicity(ap, self.conf["fs"])
            feats["cap"] = cap
            ccap = np.zeros(cap.shape)
            cap_uv = np.zeros(cap.shape)
            cap = np.copy(cap)
            for d in range(cap.shape[-1]):
                # zero the saturated (max) coded-ap values before interpolation
                # (crank/feature/feature.py:99-107)
                cap[np.where(cap[:, d] == np.max(cap[:, d])), d] = 0.0
                cap_uv[:, d], ccap[:, d] = convert_continuous_f0(cap[:, d])
            feats["ccap"] = ccap
            feats["cap_uv"] = cap_uv

    def _synthesize_world(self, flbl, feats):
        from crank_tpu.native import world

        anasyn = world.synthesize(
            feats["f0"][:, 0] if feats["f0"].ndim > 1 else feats["f0"],
            world.mc2sp(
                feats["mcep"], alpha=self.conf["mcep_alpha"], fftl=self.conf["fftl"]
            ),
            feats["ap"],
            fs=self.conf["fs"],
            shiftms=self.conf["shiftms"],
        )
        feats["x_anasyn"] = np.clip(anasyn, -1.0, 1.0)
        write_wav(self.h5_dir / (flbl + "_anasyn.wav"), anasyn, self.conf["fs"])

    def _mlfb2wavf(self, flbl, feats):
        from crank_tpu.dsp.gl import mlfb_to_wav

        for win_type in self.conf["window_types"]:
            name = "mlfb" if win_type == "hann" else f"mlfb_{win_type}"
            glf = self.h5_dir / (flbl + f"_{name}_gl.wav")
            try:
                wav = mlfb_to_wav(
                    feats[name],
                    fs=self.conf["fs"],
                    n_mels=self.conf["mlfb_dim"],
                    n_fft=self.conf["fftl"],
                    win_length=self.conf["win_length"],
                    hop_size=self.conf["hop_size"],
                    fmin=self.conf["fmin"],
                    fmax=self.conf["fmax"],
                    window="hann",
                    n_iters=self.conf["n_iteration"],
                    # short-lived joblib workers: a jit compile would dominate
                    backend="numpy",
                )
                self.h5_dir.mkdir(parents=True, exist_ok=True)
                write_wav(glf, wav, self.conf["fs"])
            except Exception as e:  # pragma: no cover
                logging.info("ERROR: GriffinLim for %s (%s)", glf, e)
