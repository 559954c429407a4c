from crank_tpu.utils.config import load_yaml  # noqa: F401
from crank_tpu.utils.scp import open_featsscp, open_scpdir  # noqa: F401
from crank_tpu.utils.audio_io import read_wav, write_wav  # noqa: F401
