"""DSP package with lazy submodule loading (PEP 562).

Host-side worker processes (feature extraction via joblib) import only the
numpy paths; deferring the jax-backed modules keeps worker startup fast.
"""

_LAZY = {
    "get_window": "crank_tpu.dsp.windows",
    "itug_729_window": "crank_tpu.dsp.windows",
    "mel_filterbank": "crank_tpu.dsp.mel",
    "hz_to_mel": "crank_tpu.dsp.mel",
    "mel_to_hz": "crank_tpu.dsp.mel",
    "mel_pseudo_inverse": "crank_tpu.dsp.mel",
    "stft_np": "crank_tpu.dsp.spectrum",
    "logmelfilterbank": "crank_tpu.dsp.spectrum",
    "stft": "crank_tpu.dsp.stft_jax",
    "istft": "crank_tpu.dsp.stft_jax",
    "frame_signal": "crank_tpu.dsp.stft_jax",
    "griffin_lim": "crank_tpu.dsp.gl",
    "griffin_lim_np": "crank_tpu.dsp.gl",
    "mlfb_to_wav": "crank_tpu.dsp.gl",
    "low_cut_filter": "crank_tpu.dsp.filters",
    "convert_continuous_f0": "crank_tpu.dsp.f0_utils",
    "convert_f0": "crank_tpu.dsp.f0_utils",
}

__all__ = list(_LAZY)


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(_LAZY[name])
        return getattr(mod, name)
    raise AttributeError(f"module 'crank_tpu.dsp' has no attribute '{name}'")
