"""Import the reference implementation with missing pip deps shimmed.

The reference at /root/reference imports several packages that are absent in
this environment (parallel_wavegan, librosa, soundfile, sprocket,
torch_optimizer, pytorch_lamb).  Only ``parallel_wavegan`` is load-bearing
for the numerical-parity tests — it is provided by ``pwg_torch``; the rest
are import-time-only stubs (their symbols are never executed by the parity
paths: losses, models, quantizer EMA).

Torch 2.x compatibility patches applied (the reference targets torch 1.x):
* ``torch.stft(..., return_complex=False)`` was removed — wrapped to call the
  complex API and ``view_as_real`` (bit-identical output layout).
* ``torch.nn.utils.clip_grad_norm`` (non-underscore alias) may be absent —
  aliased to ``clip_grad_norm_``.
"""

import sys
import types

REFERENCE_ROOT = "/root/reference"

_loaded = {}


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _patch_torch():
    import torch

    if not getattr(torch.stft, "_refparity_patched", False):
        _orig_stft = torch.stft

        def stft_compat(*args, **kwargs):
            if kwargs.get("return_complex") is False:
                kwargs["return_complex"] = True
                return torch.view_as_real(_orig_stft(*args, **kwargs))
            return _orig_stft(*args, **kwargs)

        stft_compat._refparity_patched = True
        torch.stft = stft_compat

    import torch.nn.utils as tnu

    if not hasattr(tnu, "clip_grad_norm"):
        tnu.clip_grad_norm = tnu.clip_grad_norm_


def _patch_numpy2(crank):
    """numpy>=2 compatibility for the reference dataset.

    * ``np.long`` (used at crank/net/trainer/dataset.py:155) was removed —
      restore the int64 alias.
    * ``sample[output_feat_type] == "excit"`` (dataset.py:111) compares an
      ndarray to a string: under the reference's numpy this evaluated to a
      scalar False (the branch was dead — and its body is a second bug, an
      invalid ``np.hstack`` call); modern numpy raises.  Replace the method
      with a faithful copy whose dead branch tests the evidently-intended
      ``conf["output_feat_type"] == "excit"`` (still never taken for any
      shipped conf, preserving the original semantics).
    """
    import numpy as np

    if not hasattr(np, "long"):
        np.long = np.int64

    from crank.net.trainer import dataset as ref_dataset

    if getattr(ref_dataset.BaseDataset, "_refparity_numpy2", False):
        return

    def _middle_getitem(self, sample):
        if self.scaler is not None:
            sample = self._transform(sample)
        if "mcep" in self.features and not self.conf["use_mcep_0th"]:
            sample["mcep_0th"] = sample["mcep"][..., :1]
            sample["mcep"] = sample["mcep"][..., 1:]
        if self.conf["output_feat_type"] == "excit":
            sample["excit"] = np.hstack(
                [sample["lcf0"], sample["uv"], sample["cap"]]
            )
        if self.conf["spec_augment"]:
            raise NotImplementedError("SpecAugument currently disabled.")
        sample = self._zero_padding(sample)
        for ed in [
            "encoder_mask",
            "decoder_mask",
            "cycle_encoder_mask",
            "cycle_decoder_mask",
        ]:
            sample[ed] = np.copy(sample["mask"])
        del sample["mask"]
        return sample

    ref_dataset.BaseDataset._middle_getitem = _middle_getitem
    ref_dataset.BaseDataset._refparity_numpy2 = True


def load_reference():
    """Import and return the reference ``crank`` package (cached)."""
    if "crank" in _loaded:
        return _loaded["crank"]

    _patch_torch()

    from . import pwg_torch

    # parallel_wavegan shim backed by our first-party torch implementation
    pwg = _stub_module("parallel_wavegan")
    pwg_models = _stub_module(
        "parallel_wavegan.models",
        ParallelWaveGANGenerator=pwg_torch.ParallelWaveGANGenerator,
        ParallelWaveGANDiscriminator=pwg_torch.ParallelWaveGANDiscriminator,
        ResidualParallelWaveGANDiscriminator=(
            pwg_torch.ResidualParallelWaveGANDiscriminator
        ),
    )
    pwg.models = pwg_models

    # import-time-only stubs (never executed by the parity tests)
    if "librosa" not in sys.modules:
        lr = _stub_module("librosa")
        lr.filters = _stub_module("librosa.filters", mel=None)
        lr.util = _stub_module("librosa.util")
    if "soundfile" not in sys.modules:
        _stub_module("soundfile", read=None, write=None)
    if "sprocket" not in sys.modules:
        sp = _stub_module("sprocket")
        sp.speech = _stub_module(
            "sprocket.speech", FeatureExtractor=None, Synthesizer=None
        )
        sp.util = _stub_module("sprocket.util", HDF5=None)
    if "torch_optimizer" not in sys.modules:
        _stub_module("torch_optimizer", RAdam=None)
    if "pytorch_lamb" not in sys.modules:
        _stub_module("pytorch_lamb", Lamb=None)

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import crank  # noqa: F401
    import crank.net.module.loss  # noqa: F401
    import crank.net.module.spkradv  # noqa: F401
    import crank.net.module.vqvae2  # noqa: F401
    import crank.net.trainer.trainer_vqvae  # noqa: F401

    _patch_numpy2(crank)

    _loaded["crank"] = crank
    return crank


def make_ref_criterion(conf):
    """The reference criterion dict (crank/net/trainer/utils.py:22-37),
    built directly from the reference loss module on CPU."""
    import torch.nn as nn

    load_reference()
    from crank.net.module.loss import CustomFeatureLoss

    return {
        "mse": nn.MSELoss(),
        "l1": nn.L1Loss(),
        "ce": nn.CrossEntropyLoss(ignore_index=-100),
        "fmse": CustomFeatureLoss(
            loss_type="mse", causal=conf["causal"], device="cpu"
        ),
        "fl1": CustomFeatureLoss(
            loss_type="l1", causal=conf["causal"], device="cpu"
        ),
        "fstft": CustomFeatureLoss(
            loss_type="stft",
            causal=conf["causal"],
            stft_params=conf["stft_params"],
            device="cpu",
        ),
    }


class RefLossHarness:
    """Duck-typed stand-in for the reference VQVAETrainer, exposing its real
    unbound loss methods (calculate_vqvae_loss / calculate_spkradv_loss /
    _parse_vqvae_loss) without constructing the full trainer."""

    def __init__(self, conf, models):
        load_reference()
        from crank.net.trainer.trainer_vqvae import VQVAETrainer

        self._cls = VQVAETrainer
        self.conf = conf
        self.model = models
        self.criterion = make_ref_criterion(conf)

    def calculate_vqvae_loss(self, batch, outputs, loss):
        return self._cls.calculate_vqvae_loss(self, batch, outputs, loss)

    def calculate_spkradv_loss(self, batch, outputs, loss, label="org"):
        return self._cls.calculate_spkradv_loss(
            self, batch, outputs, loss, label=label
        )

    def calculate_cyclevqvae_loss(self, batch, outputs, loss):
        return self._cls.calculate_cyclevqvae_loss(self, batch, outputs,
                                                   loss)

    def _parse_vqvae_loss(self, loss):
        return self._cls._parse_vqvae_loss(self, loss)

    def _parse_cyclevqvae_loss(self, loss):
        return self._cls._parse_cyclevqvae_loss(self, loss)


class RefLSGANHarness(RefLossHarness):
    """Same duck-typing for the reference LSGANTrainer's adversarial loss
    methods (calculate_adv_loss / calculate_discriminator_loss /
    calculate_acgan_loss / get_D_inputs)."""

    def __init__(self, conf, models, n_spkrs):
        super().__init__(conf, models)
        from crank.net.trainer.trainer_lsgan import LSGANTrainer

        self._lsgan = LSGANTrainer
        self.n_spkrs = n_spkrs

    def calculate_adv_loss(self, batch, decoded, h, mask, loss):
        return self._lsgan.calculate_adv_loss(
            self, batch, decoded, h, mask, loss
        )

    def calculate_discriminator_loss(self, sample, h, mask, loss,
                                     label="real", updates=None):
        return self._lsgan.calculate_discriminator_loss(
            self, sample, h, mask, loss, label=label, updates=updates
        )

    def calculate_acgan_loss(self, spkr_cls, h, loss, label="adv",
                             model="G"):
        return self._lsgan.calculate_acgan_loss(
            self, spkr_cls, h, loss, label=label, model=model
        )

    def get_D_inputs(self, batch, feats, label="org"):
        return self._lsgan.get_D_inputs(self, batch, feats, label=label)
