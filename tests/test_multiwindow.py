"""Multi-window feature extraction (window_types incl. itu-g) and scaler
coverage for the per-window mlfb variants (feature.py:126-145,
extract_statistics.py:66-68 semantics)."""

import h5py
import numpy as np

from crank_tpu.features.extractor import FeatureExtractor
from crank_tpu.features.scaler import fit_scalers
from crank_tpu.utils.audio_io import write_wav


def test_multiwindow_extraction_and_scalers(tmp_path, speech_like_wav):
    x, fs = speech_like_wav
    wavf = tmp_path / "SF1_001.wav"
    write_wav(wavf, x, fs)
    conf = {
        "fs": fs, "fftl": 1024, "win_length": 1024, "hop_size": 128,
        "window_types": ["hann", "itu-g"], "fmin": 80, "fmax": 7600,
        "mlfb_dim": 40, "n_iteration": 2, "framems": 20, "shiftms": 5.80499,
        "mcep_dim": 24, "mcep_alpha": 0.466,
    }
    fe = FeatureExtractor(tmp_path / "feat", conf,
                          {"minf0": 70, "maxf0": 340, "npow": -20})
    h5f = fe.analyze(str(wavf), synth_flag=False)
    with h5py.File(h5f, "r") as fp:
        assert "mlfb" in fp and "mlfb_itu-g" in fp
        hann = fp["mlfb"][:]
        itug = fp["mlfb_itu-g"][:]
    assert hann.shape == itug.shape
    assert not np.allclose(hann, itug)  # different windows, different values

    full_conf = {"feature": conf}
    scaler = fit_scalers([str(h5f)], full_conf)
    assert "mlfb" in scaler and "mlfb_itu-g" in scaler and "mcep" in scaler
    assert scaler["mlfb_itu-g"].n_samples_seen_ == itug.shape[0]
