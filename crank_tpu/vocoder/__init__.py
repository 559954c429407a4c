from crank_tpu.vocoder.model import MelUpsampler, PWGVocoder  # noqa: F401
