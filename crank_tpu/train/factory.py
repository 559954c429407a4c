"""Model construction from config (crank/bin/train.py:56-131 equivalent)."""

from typing import Any, Dict

import jax
import jax.numpy as jnp

from crank_tpu.models import (
    ConvDiscriminator,
    ResidualDiscriminator,
    SpeakerAdversarialNetwork,
    VQVAE2,
    VQVAE2Config,
)


def build_models(conf: Dict[str, Any], spkr_size: int, scaler=None):
    """Returns a dict of flax modules {G[, SPKRADV][, C][, D]}."""
    models = {"G": VQVAE2(VQVAE2Config.from_conf(conf, spkr_size, scaler))}

    if conf["use_spkradv_training"]:
        models["SPKRADV"] = SpeakerAdversarialNetwork(
            spkr_size=spkr_size,
            scale=conf["spkradv_lambda"],
            kernel_size=conf["spkradv_kernel_size"],
            layers=conf["n_spkradv_layers"],
        )

    if conf["use_spkr_classifier"]:
        models["C"] = ConvDiscriminator(
            out_channels=spkr_size,
            kernel_size=conf["spkr_classifier_kernel_size"],
            layers=conf["n_spkr_classifier_layers"],
            conv_channels=64,
            dilation_factor=1,
        )

    if conf["trainer_type"] in ("lsgan", "cyclegan", "stargan"):
        input_channels = conf["input_size"]
        if conf["use_D_uv"]:
            input_channels += 1
        if conf["use_D_spkrcode"]:
            input_channels += (
                conf["spkr_embedding_size"]
                if conf["use_spkr_embedding"]
                else spkr_size
            )
        output_channels = 1
        if conf["acgan_flag"]:
            output_channels += spkr_size
        if conf["use_residual_network"]:
            models["D"] = ResidualDiscriminator(
                out_channels=output_channels,
                kernel_size=conf["discriminator_kernel_size"],
                layers=conf["n_discriminator_layers"]
                * conf["n_discriminator_stacks"],
                stacks=conf["n_discriminator_stacks"],
                dropout=conf["discriminator_dropout"],
            )
        else:
            models["D"] = ConvDiscriminator(
                out_channels=output_channels,
                kernel_size=conf["discriminator_kernel_size"],
                layers=conf["n_discriminator_layers"]
                * conf["n_discriminator_stacks"],
                conv_channels=64,
                dilation_factor=1,
            )
    return models


def example_g_inputs(conf, spkr_size, B=2, T=None):
    """Example (feats, enc_h, dec_h, spkrvec) for initializing G."""
    T = T or conf["batch_len"]
    feat = conf["feature"]
    if conf.get("use_raw") or conf.get("use_sinc_conv"):
        # frame-aligned raw crop convention (dataset.py padding_raw)
        x = jnp.zeros((B, feat["fftl"] + feat["hop_size"] * T - 1))
    else:
        x = jnp.zeros((B, T, conf["input_size"]))
    enc_h = jnp.zeros((B, T, 2)) if conf["encoder_f0"] else None
    f0 = jnp.zeros((B, T, 2)) if conf["decoder_f0"] else None
    if conf["use_spkr_embedding"]:
        dec_h, spkrvec = f0, jnp.zeros((B, T), jnp.int32)
    else:
        onehot = jnp.zeros((B, T, spkr_size))
        dec_h = onehot if f0 is None else jnp.concatenate([f0, onehot], -1)
        spkrvec = None
    return x, enc_h, dec_h, spkrvec


def jit_init(module, *args, **kwargs):
    """``module.init`` under one jit.

    Eager flax init dispatches every op separately; on a remote/tunneled
    backend each becomes its own XLA compile + RPC (measured: ~450
    op-compiles ≈ minutes of wall time for a model + vocoder init in the
    streaming CLI).  One traced program compiles once and runs in ms."""
    return jax.jit(lambda *a: module.init(*a, **kwargs))(*args)


def init_models(models, conf, spkr_size, rng, B=2, T=None):
    """Initialize all model variables; returns (params dict, ema collection)."""
    T = T or conf["batch_len"]
    keys = jax.random.split(rng, 4)
    params, ema = {}, {}

    x, enc_h, dec_h, spkrvec = example_g_inputs(conf, spkr_size, B, T)
    g_vars = jit_init(models["G"], keys[0], x, enc_h, dec_h, spkrvec)
    params["G"] = g_vars["params"]
    ema = g_vars.get("ema", {})

    if "SPKRADV" in models:
        enc = [
            jnp.zeros((B, T, conf["emb_dim"][n]))
            for n in range(conf["n_vq_stacks"])
        ]
        params["SPKRADV"] = jit_init(models["SPKRADV"], keys[1], enc)["params"]

    if "C" in models:
        params["C"] = jit_init(
            models["C"], keys[2], jnp.zeros((B, T, conf["input_size"]))
        )["params"]

    if "D" in models:
        in_ch = conf["input_size"]
        if conf["use_D_uv"]:
            in_ch += 1
        if conf["use_D_spkrcode"]:
            in_ch += (
                conf["spkr_embedding_size"]
                if conf["use_spkr_embedding"]
                else spkr_size
            )
        params["D"] = jit_init(
            models["D"], keys[3], jnp.zeros((B, T, in_ch))
        )["params"]
    return params, ema
