from crank_tpu.models.vqvae import VQVAE2, VQVAE2Config  # noqa: F401
from crank_tpu.models.vq import Quantizer  # noqa: F401
from crank_tpu.models.wavenet import WaveNetBackbone  # noqa: F401
from crank_tpu.models.discriminator import (  # noqa: F401
    ConvDiscriminator,
    ResidualDiscriminator,
)
from crank_tpu.models.spkradv import (  # noqa: F401
    SpeakerAdversarialNetwork,
    gradient_reversal,
)
from crank_tpu.models.frontend import (  # noqa: F401
    LogMelFilterBank,
    SincConv,
    SincConvFrontend,
)
