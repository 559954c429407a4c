"""Hierarchical VQ-VAE generator (flagship model).

Functional JAX re-design of the reference VQVAE2
(crank/net/module/vqvae2.py:38-283): 1-3 stacked WaveNet encoder/decoder
pairs with per-stack vector quantizers, top-down decoding with additive
hierarchical residual (enc[n] + dec), concatenation of all quantized codes
into the bottom decoder, speaker embedding, optional raw-waveform frontends,
and a cycle_forward for cyclic training.  All feature maps are [B, T, C]
(feature-last; no transposes anywhere on the hot path).

State handling: EMA codebooks live in the mutable "ema" collection (see
models/vq.py); every training forward with use_ema=True updates them, which
reproduces the reference's in-place buffer mutation semantics explicitly.
"""

import os
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from crank_tpu.models.frontend import LogMelFilterBank, SincConvFrontend
from crank_tpu.models.vq import Quantizer
from crank_tpu.models.wavenet import WaveNetBackbone, receptive_field_size


@dataclass(frozen=True)
class VQVAE2Config:
    input_size: int = 80
    output_size: int = 80
    n_vq_stacks: int = 2
    n_layers: Tuple[int, ...] = (2, 2, 2)
    n_layers_stacks: Tuple[int, ...] = (4, 3, 2)
    kernel_size: Tuple[int, ...] = (5, 3, 3)
    emb_dim: Tuple[int, ...] = (64, 64, 64)
    emb_size: Tuple[int, ...] = (512, 512, 512)
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    causal: bool = False
    ema_flag: bool = True
    spkr_size: int = 0
    use_spkr_embedding: bool = True
    spkr_embedding_size: int = 32
    n_cycles: int = 1
    # raw-waveform frontends
    use_raw: bool = False
    use_sinc_conv: bool = False
    fs: int = 22050
    fftl: int = 1024
    win_length: int = 1024
    hop_size: int = 128
    raw_window_type: str = "hann"
    mlfb_dim: int = 80
    fmin: float = 80.0
    fmax: float = 7600.0
    scaler_mean: Optional[Tuple[float, ...]] = None
    scaler_std: Optional[Tuple[float, ...]] = None
    sinc_conv_channels: int = 32
    sinc_conv_kernel_size: int = 65
    sinc_conv_pools: Tuple[int, ...] = (4, 4, 4, 2)
    # bf16 conv compute (params f32, VQ/losses f32) when "bf16"
    mixed_precision: str = "none"
    # chunked low-latency inference (causal models only): every causal conv
    # carries its left context in the mutable "cache" collection, so feeding
    # chunks reproduces the offline causal forward exactly.  Parameter tree
    # is identical to the non-streaming model (checkpoints load directly).
    streaming: bool = False

    @classmethod
    def from_conf(cls, conf: Dict[str, Any], spkr_size: int, scaler=None):
        """Build from a reference-compatible YAML config dict."""
        feat = conf["feature"]
        mean = std = None
        if (
            conf.get("use_raw")
            and conf.get("use_preprocessed_scaler")
            and scaler is not None
        ):
            mean = tuple(np.asarray(scaler["mlfb"].mean_, dtype=float))
            std = tuple(np.sqrt(np.asarray(scaler["mlfb"].var_, dtype=float)))
        if conf.get("use_sinc_conv"):
            pools = tuple(conf["sinc_conv_down_sample_kernel_sizes"])
            if int(np.prod(pools)) != feat["hop_size"]:
                raise ValueError(
                    "Product of sinc_conv_down_sample_kernel_sizes must equal "
                    "hop_size."
                )
        else:
            pools = tuple(conf.get("sinc_conv_down_sample_kernel_sizes", (4, 4, 4, 2)))
        return cls(
            input_size=conf["input_size"],
            output_size=conf["output_size"],
            n_vq_stacks=conf["n_vq_stacks"],
            n_layers=tuple(conf["n_layers"]),
            n_layers_stacks=tuple(conf["n_layers_stacks"]),
            kernel_size=tuple(conf["kernel_size"]),
            emb_dim=tuple(conf["emb_dim"]),
            emb_size=tuple(conf["emb_size"]),
            causal=conf["causal"],
            ema_flag=conf["ema_flag"],
            spkr_size=spkr_size,
            use_spkr_embedding=conf["use_spkr_embedding"],
            spkr_embedding_size=conf["spkr_embedding_size"],
            n_cycles=conf.get("n_cycles", 1),
            use_raw=conf.get("use_raw", False),
            use_sinc_conv=conf.get("use_sinc_conv", False),
            fs=feat["fs"],
            fftl=feat["fftl"],
            win_length=feat.get("win_length", feat["fftl"]),
            hop_size=feat["hop_size"],
            raw_window_type=conf.get("raw_window_type", "hann"),
            mlfb_dim=feat["mlfb_dim"],
            fmin=feat["fmin"],
            fmax=feat["fmax"],
            scaler_mean=mean,
            scaler_std=std,
            sinc_conv_channels=conf.get("sinc_conv_channels", 32),
            sinc_conv_kernel_size=conf.get("sinc_conv_kernel_sizes", 65),
            sinc_conv_pools=pools,
            mixed_precision=os.environ.get(
                "CRANK_TPU_MIXED_PRECISION",
                conf.get("mixed_precision", "none"),
            ),
        )


class VQVAE2(nn.Module):
    cfg: VQVAE2Config

    @property
    def encoder_receptive_size(self) -> int:
        c = self.cfg
        return sum(
            receptive_field_size(
                c.n_layers[n] * c.n_layers_stacks[n],
                c.n_layers_stacks[n],
                c.kernel_size[n],
            )
            for n in range(c.n_vq_stacks)
        )

    decoder_receptive_size = encoder_receptive_size

    def setup(self):
        c = self.cfg
        if c.streaming and not c.causal:
            raise ValueError("streaming inference requires causal=True")
        dtype = jnp.bfloat16 if c.mixed_precision == "bf16" else None
        encs, decs, qts = [], [], []
        for n in range(c.n_vq_stacks):
            if n == 0:
                dec_out = c.output_size
            else:
                dec_out = c.emb_dim[n - 1]
            encs.append(
                WaveNetBackbone(
                    out_channels=c.emb_dim[n],
                    kernel_size=c.kernel_size[n],
                    layers=c.n_layers[n] * c.n_layers_stacks[n],
                    stacks=c.n_layers_stacks[n],
                    residual_channels=c.residual_channels,
                    gate_channels=c.gate_channels,
                    skip_channels=c.skip_channels,
                    causal=c.causal,
                    streaming=c.streaming,
                    dtype=dtype,
                    name=f"encoder_{n}",
                )
            )
            decs.append(
                WaveNetBackbone(
                    out_channels=dec_out,
                    kernel_size=c.kernel_size[n],
                    layers=c.n_layers[n] * c.n_layers_stacks[n],
                    stacks=c.n_layers_stacks[n],
                    residual_channels=c.residual_channels,
                    gate_channels=c.gate_channels,
                    skip_channels=c.skip_channels,
                    causal=c.causal,
                    streaming=c.streaming,
                    dtype=dtype,
                    name=f"decoder_{n}",
                )
            )
            qts.append(
                Quantizer(
                    emb_dim=c.emb_dim[n],
                    emb_size=c.emb_size[n],
                    ema_flag=c.ema_flag,
                    name=f"quantizer_{n}",
                )
            )
        self.encoders = encs
        self.decoders = decs
        self.quantizers = qts
        if c.use_spkr_embedding:
            self.spkr_embedding = nn.Embed(
                num_embeddings=c.spkr_size, features=c.spkr_embedding_size
            )
        if c.use_raw:
            self.preprocess = LogMelFilterBank(
                fs=c.fs,
                hop_size=c.hop_size,
                fft_size=c.fftl,
                win_length=c.win_length,
                window=c.raw_window_type,
                center=False,
                n_mels=c.mlfb_dim,
                fmin=c.fmin,
                fmax=c.fmax,
                scaler_mean=c.scaler_mean,
                scaler_std=c.scaler_std,
            )
        elif c.use_sinc_conv:
            self.preprocess = SincConvFrontend(
                sinc_channels=c.sinc_conv_channels,
                sinc_kernel_size=c.sinc_conv_kernel_size,
                out_channels=c.input_size,
                pool_kernel_sizes=c.sinc_conv_pools,
                fs=float(c.fs),
            )

    # ------------------------------------------------------------------ #

    def _maybe_preprocess(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.cfg.use_raw:
            return self.preprocess(x)
        if self.cfg.use_sinc_conv:
            out = self.preprocess(x)
            # align the sinc frontend's frame grid to the STFT crop
            # convention (raw crops are fftl + hop*T - 1 samples,
            # dataset.py:261-278): trim the half-window lead-in and cut to
            # the T frames the rest of the batch uses.  (The reference
            # leaves this mismatch unresolved — its sinc path errors on
            # frame-count mismatch at loss time.)
            c = self.cfg
            t = (x.shape[-1] - c.fftl) // c.hop_size + 1
            offset = (c.fftl // 2) // c.hop_size
            if out.shape[1] < offset + t:
                out = jnp.pad(
                    out, ((0, 0), (0, offset + t - out.shape[1]), (0, 0))
                )
            return out[:, offset : offset + t]
        return x

    def _make_dec_h(self, dec_h, spkrvec):
        if spkrvec is not None:
            emb = self.spkr_embedding(spkrvec)
            dec_h = emb if dec_h is None else jnp.concatenate([dec_h, emb], -1)
        return dec_h

    def encode(self, x, enc_h=None) -> List[jnp.ndarray]:
        encoded = []
        enc = x
        for n in range(self.cfg.n_vq_stacks):
            enc = self.encoders[n](enc, c=enc_h if n == 0 else None)
            encoded.append(enc)
        return encoded

    def decode(self, enc, dec_h, train=False, use_ema=True, detach=False):
        """Top-down decode; returns (modified enc list, decoded, emb_idxs,
        quantized list, code-index list) — lists in top-to-bottom call order,
        like the reference (crank/net/module/vqvae2.py:171-190)."""
        enc = list(enc)
        dec = 0.0
        emb_idxs, qxs, qidxs = [], [], []
        for n in reversed(range(self.cfg.n_vq_stacks)):
            enc[n] = enc[n] + dec
            emb_idx, qx, qidx = self.quantizers[n](
                enc[n], train=train, use_ema=use_ema
            )
            if detach:
                qx = jax.lax.stop_gradient(qx)
            emb_idxs.append(emb_idx)
            qxs.append(qx)
            qidxs.append(qidx)
            if n != 0:
                dec = self.decoders[n](qx)
            else:
                dec = self.decoders[0](jnp.concatenate(qxs, axis=-1), c=dec_h)
        return enc, dec, emb_idxs, qxs, qidxs

    def _make_outputs(self, enc, dec, emb_idxs, qidxs, enc_unmod):
        # lists are returned bottom-stack-first (index 0 = bottom), matching
        # the reference's make_dict reversal (vqvae2.py:197-209)
        return {
            "encoded": enc,
            "encoded_unmod": enc_unmod,
            "decoded": dec,
            "emb_idx": emb_idxs[::-1],
            "qidx": qidxs[::-1],
        }

    def __call__(
        self,
        x,
        enc_h=None,
        dec_h=None,
        spkrvec=None,
        train: bool = False,
        use_ema: bool = True,
        encoder_detach: bool = False,
    ) -> Dict[str, Any]:
        """Plain encode-quantize-decode forward ([B, T, D] in and out)."""
        x = self._maybe_preprocess(x)
        dec_h = self._make_dec_h(dec_h, spkrvec)
        enc = self.encode(x, enc_h=enc_h)
        enc_unmod = list(enc)
        enc, dec, emb_idxs, _, qidxs = self.decode(
            enc, dec_h, train=train, use_ema=use_ema, detach=encoder_detach
        )
        return self._make_outputs(enc, dec, emb_idxs, qidxs, enc_unmod)

    def cycle_forward(
        self,
        x,
        org_enc_h=None,
        org_dec_h=None,
        cv_enc_h=None,
        cv_dec_h=None,
        org_spkrvec=None,
        cv_spkrvec=None,
        train: bool = False,
        use_ema: bool = True,
    ) -> List[Dict[str, Dict[str, Any]]]:
        """Cyclic forward: encode -> (org, cv) decode -> re-encode cv -> recon.

        Faithful to the reference (vqvae2.py:101-152) including the list
        aliasing: the cv decode consumes the encoder outputs *already modified*
        by the org decode's hierarchical residual, and both org and cv output
        dicts carry the doubly-modified encodings.
        """
        x = self._maybe_preprocess(x)
        org_dec_h = self._make_dec_h(org_dec_h, org_spkrvec)
        cv_dec_h = self._make_dec_h(cv_dec_h, cv_spkrvec)

        outputs = []
        for _ in range(self.cfg.n_cycles):
            enc0 = self.encode(x, enc_h=org_enc_h)
            enc_unmod = list(enc0)
            enc1, org_dec, org_emb, _, org_qidx = self.decode(
                enc0, org_dec_h, train=train, use_ema=use_ema
            )
            enc2, cv_dec, cv_emb, _, cv_qidx = self.decode(
                enc1, cv_dec_h, train=train, use_ema=use_ema
            )
            renc0 = self.encode(cv_dec, enc_h=cv_enc_h)
            renc_unmod = list(renc0)
            renc1, recon_dec, recon_emb, _, recon_qidx = self.decode(
                renc0, org_dec_h, train=train, use_ema=use_ema
            )
            outputs.append(
                {
                    "org": self._make_outputs(
                        enc2, org_dec, org_emb, org_qidx, enc_unmod
                    ),
                    "cv": self._make_outputs(
                        enc2, cv_dec, cv_emb, cv_qidx, enc_unmod
                    ),
                    "recon": self._make_outputs(
                        renc1, recon_dec, recon_emb, recon_qidx, renc_unmod
                    ),
                }
            )
            x = jax.lax.stop_gradient(recon_dec)
        return outputs
