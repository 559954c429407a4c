from crank_tpu.dsp.windows import get_window, itug_729_window  # noqa: F401
from crank_tpu.dsp.mel import mel_filterbank, hz_to_mel, mel_to_hz  # noqa: F401
from crank_tpu.dsp.stft_np import stft_np, logmelfilterbank  # noqa: F401
from crank_tpu.dsp.stft_jax import stft, istft, frame_signal  # noqa: F401
from crank_tpu.dsp.griffin_lim import griffin_lim, mlfb_to_wav  # noqa: F401
from crank_tpu.dsp.filters import low_cut_filter  # noqa: F401
from crank_tpu.dsp.f0_utils import convert_continuous_f0, convert_f0  # noqa: F401
