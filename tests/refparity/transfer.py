"""torch -> flax weight transfer for the reference parity tests.

Maps the reference torch modules (built on the pwg_torch shim, weight norm
removed) onto crank_tpu's flax parameter trees.  Layout conversions:

* torch Conv1d weight [out, in, k] -> flax nn.Conv kernel [k, in, out]
* flax WeightNorm reparametrization: kernel v is stored raw plus a
  per-output-feature ``scale``; effective kernel = scale * v / sqrt(sum v^2
  + eps).  Setting kernel = W and scale = sqrt(sum W^2 + eps) reproduces W
  exactly (up to one f32 rounding).
* torch nn.Embedding weight [N, D] -> flax nn.Embed embedding [N, D]
* reference Quantizer (vqvae2.py:286-304): embedding.weight [K, D] ->
  "ema" collection codebook [K, D]; ema_size [K], ema_w [D, K] unchanged.
"""

import numpy as np

_WN_EPS = 1e-12


def _np(t):
    return t.detach().cpu().numpy()


def conv_to_flax(out, prefix, conv, weight_norm=True):
    """Write one torch Conv1d into flat flax dict ``out`` under
    ``prefix`` (tuple path of the crank_tpu Conv1d module).

    Two torch-side cases, auto-detected:

    * weight norm still applied (``weight_v``/``weight_g`` present, the
      reference's as-shipped training parametrization —
      crank/net/module/vqvae2.py:250,269): transfer the (v, g)
      decomposition DIRECTLY — flax kernel = v, flax scale = g — so the
      flax WeightNorm trains the numerically identical parametrization
      (both sides compute kernel = g * v / ||v|| per output channel;
      torch dim=0 over [out,in,k] == flax feature_axes=-1 over
      [k,in,out]).
    * weight norm removed: plain weight W becomes the kernel and the
      scale is set to ||W|| so the effective kernel reproduces W exactly.
    """
    v = getattr(conv, "weight_v", None)
    if v is not None:  # torch weight norm applied: exact (v, g) transfer
        kernel = np.transpose(_np(v), (2, 1, 0)).astype(np.float32)
        out[prefix + ("Conv_0", "kernel")] = kernel
        if conv.bias is not None:
            out[prefix + ("Conv_0", "bias")] = _np(conv.bias).astype(
                np.float32
            )
        if not weight_norm:
            raise AssertionError(
                "torch module has weight norm applied but the flax target "
                "was built without WeightNorm params"
            )
        scale = _np(conv.weight_g).reshape(-1).astype(np.float32)  # [out]
        out[prefix + ("WeightNorm_0", "Conv_0/kernel/scale")] = scale
        return
    w = _np(conv.weight)  # [out, in, k]
    kernel = np.transpose(w, (2, 1, 0)).astype(np.float32)  # [k, in, out]
    out[prefix + ("Conv_0", "kernel")] = kernel
    if conv.bias is not None:
        out[prefix + ("Conv_0", "bias")] = _np(conv.bias).astype(np.float32)
    if weight_norm:
        scale = np.sqrt(
            np.sum(kernel.astype(np.float64) ** 2, axis=(0, 1)) + _WN_EPS
        ).astype(np.float32)
        # flax registers the scale as a single param named "Conv_0/kernel/scale"
        out[prefix + ("WeightNorm_0", "Conv_0/kernel/scale")] = scale


def pwg_generator_to_flax(out, prefix, gen):
    """Map a (weight-norm-removed) pwg_torch.ParallelWaveGANGenerator onto a
    crank_tpu WaveNetBackbone subtree rooted at ``prefix``."""
    conv_to_flax(out, prefix + ("first_conv",), gen.first_conv)
    for i, block in enumerate(gen.conv_layers):
        bp = prefix + (f"block_{i}",)
        conv_to_flax(out, bp + ("Conv1d_0",), block.conv)
        if block.conv1x1_aux is not None:
            conv_to_flax(out, bp + ("aux_conv",), block.conv1x1_aux)
        conv_to_flax(out, bp + ("skip_conv",), block.conv1x1_skip)
        conv_to_flax(out, bp + ("out_conv",), block.conv1x1_out)
    conv_to_flax(out, prefix + ("post_conv1",), gen.last_conv_layers[1])
    conv_to_flax(out, prefix + ("post_conv2",), gen.last_conv_layers[3])


def pwg_discriminator_to_flax(out, prefix, disc):
    """pwg_torch.ParallelWaveGANDiscriminator -> ConvDiscriminator subtree."""
    convs = [m for m in disc.conv_layers if hasattr(m, "weight")]
    for i, conv in enumerate(convs[:-1]):
        conv_to_flax(out, prefix + (f"conv_{i}",), conv)
    conv_to_flax(out, prefix + ("conv_out",), convs[-1])


def pwg_residual_discriminator_to_flax(out, prefix, disc):
    """pwg_torch.ResidualParallelWaveGANDiscriminator -> ResidualDiscriminator."""
    conv_to_flax(out, prefix + ("first_conv",), disc.first_conv[0])
    for i, block in enumerate(disc.conv_layers):
        bp = prefix + (f"block_{i}",)
        conv_to_flax(out, bp + ("Conv1d_0",), block.conv)
        conv_to_flax(out, bp + ("skip_conv",), block.conv1x1_skip)
        conv_to_flax(out, bp + ("out_conv",), block.conv1x1_out)
    conv_to_flax(out, prefix + ("post_conv1",), disc.last_conv_layers[1])
    conv_to_flax(out, prefix + ("post_conv2",), disc.last_conv_layers[3])


def vqvae2_to_flax(ref_model, flax_variables):
    """Transfer a reference VQVAE2 (torch, weight norm removed) into the flax
    variables dict {params, [ema]}.  Returns a new variables dict; raises if
    any flax parameter is left unassigned or shapes mismatch."""
    import flax.traverse_util as tu
    import jax.numpy as jnp

    conf = ref_model.conf
    n_stacks = conf["n_vq_stacks"]
    ema_flag = conf["ema_flag"]

    flat = {}
    for n in range(n_stacks):
        pwg_generator_to_flax(flat, (f"encoder_{n}",), ref_model.encoders[n])
        pwg_generator_to_flax(flat, (f"decoder_{n}",), ref_model.decoders[n])
    if conf["use_spkr_embedding"]:
        flat[("spkr_embedding", "embedding")] = _np(
            ref_model.spkr_embedding.weight
        ).astype(np.float32)

    ema_flat = {}
    for n in range(n_stacks):
        q = ref_model.quantizers[n]
        cb = _np(q.embedding.weight).astype(np.float32)  # [K, D]
        if ema_flag:
            ema_flat[(f"quantizer_{n}", "codebook")] = cb
            ema_flat[(f"quantizer_{n}", "ema_size")] = _np(q.ema_size).astype(
                np.float32
            )
            ema_flat[(f"quantizer_{n}", "ema_w")] = _np(q.ema_w).astype(
                np.float32
            )
        else:
            flat[(f"quantizer_{n}", "codebook")] = cb

    out = {}
    tgt = tu.flatten_dict(flax_variables["params"])
    _check_cover(tgt, flat, "params")
    out["params"] = tu.unflatten_dict(
        {k: jnp.asarray(flat[k]) for k in tgt}
    )
    if ema_flag:
        tgt_ema = tu.flatten_dict(flax_variables["ema"])
        _check_cover(tgt_ema, ema_flat, "ema")
        out["ema"] = tu.unflatten_dict(
            {k: jnp.asarray(ema_flat[k]) for k in tgt_ema}
        )
    return out


def module_to_flax(mapper, ref_module, flax_variables, prefix=()):
    """Generic single-module transfer (discriminator/classifier nets)."""
    import flax.traverse_util as tu
    import jax.numpy as jnp

    flat = {}
    mapper(flat, prefix, ref_module)
    tgt = tu.flatten_dict(flax_variables["params"])
    _check_cover(tgt, flat, "params")
    return {
        "params": tu.unflatten_dict({k: jnp.asarray(flat[k]) for k in tgt})
    }


def _check_cover(tgt, src, name):
    missing = sorted(set(tgt) - set(src))
    extra = sorted(set(src) - set(tgt))
    if missing or extra:
        raise AssertionError(
            f"{name} transfer mismatch:\n"
            f"  unassigned flax params: {missing[:10]}\n"
            f"  unmatched torch params: {extra[:10]}"
        )
    for k in tgt:
        if tuple(tgt[k].shape) != tuple(src[k].shape):
            raise AssertionError(
                f"{name} shape mismatch at {k}: flax {tgt[k].shape} "
                f"vs torch {src[k].shape}"
            )
