"""Jitted training steps.

The reference's trainer class hierarchy (vqvae ⊂ lsgan ⊂ {cyclegan, stargan},
crank/net/trainer/*.py) is re-composed here as loss-term configuration inside
a single jitted step function per phase.  One step executes the full update
sequence (G, then D when the GAN phase is active, then SPKRADV, then C), each
with its own optax optimizer, with the VQ-EMA state threaded explicitly
through every generator forward in reference order (each training-mode
forward updates the codebooks, reproducing the reference's in-place buffer
semantics).

Phase switches (GAN start / cycle start / generator freeze) are Python-level
static flags — each (trainer_type, phase) combination compiles once.  All
in-step randomness (CycleGAN's fake pick, StarGAN's switch_update) is
explicit JAX PRNG.  Steps are written against the *global* batch: under a
data-parallel mesh, XLA inserts gradient all-reduces and the EMA-statistics
reductions automatically (SURVEY.md §2.5 replacement).
"""

from dataclasses import dataclass

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from crank_tpu.models.loss import (
    cross_entropy,
    feature_loss,
    masked_mean,
    multi_stft_loss,
)
from crank_tpu.models.vqvae import VQVAE2


@dataclass(frozen=True)
class Mode:
    trainer_type: str = "vqvae"
    gan_flag: bool = False
    cycle_flag: bool = False
    stop_generator: bool = False
    do_update: bool = True


def _strip_ignore(h):
    """Replace -100 padding with the per-utterance speaker id (basetrainer
    _get_spkr_conditions: h[:, :] = h[:, 0:1])."""
    return jnp.broadcast_to(h[:, :1], h.shape)


class StepFactory:
    def __init__(self, conf, models, optimizers, spkr_size):
        self.conf = conf
        self.models = models
        self.opts = optimizers
        self.spkr_size = spkr_size
        self.has_ema = bool(conf["ema_flag"])
        self.alpha = conf["alpha"]
        stp = conf["stft_params"]
        self.stft_kw = dict(
            fft_sizes=tuple(stp["fft_sizes"]),
            win_sizes=tuple(stp["win_sizes"]),
            hop_sizes=tuple(stp["hop_sizes"]),
            logratio=float(stp.get("logratio", 0.0)),
        )
        self.causal = bool(conf["causal"])
        self.causal_size = int(conf.get("causal_size", 0))
        self.er = (
            models["G"].encoder_receptive_size if self.causal else 0
        )
        self._cache: Dict[Any, Any] = {}

    # ----------------------------- conditioning ------------------------- #

    def _f0_condition(self, batch, use_cvfeats=False):
        lcf0 = batch["cv_lcf0"] if use_cvfeats else batch["lcf0"]
        return jnp.concatenate([lcf0, batch["uv"]], axis=-1)

    def enc_h(self, batch, use_cvfeats=False):
        if self.conf["encoder_f0"]:
            return self._f0_condition(batch, use_cvfeats)
        return None

    def dec_h(self, batch, use_cvfeats=False):
        """Returns (dec_h, spkrvec) like basetrainer._get_dec_h."""
        lbl = "cv" if use_cvfeats else "org"
        f0 = (
            self._f0_condition(batch, use_cvfeats)
            if self.conf["decoder_f0"]
            else None
        )
        if not self.conf["use_spkr_embedding"]:
            onehot = batch[f"{lbl}_h_onehot"]
            h = onehot if f0 is None else jnp.concatenate([f0, onehot], -1)
            return h, None
        return f0, _strip_ignore(batch[f"{lbl}_h"])

    def g_feats(self, batch):
        if self.conf.get("use_raw") or self.conf.get("use_sinc_conv"):
            return batch["raw"]
        return batch["in_feats"]

    # ----------------------------- model applies ------------------------ #

    def g_forward(self, pG, ema, args, train=True, use_ema=True,
                  encoder_detach=False, cycle=False):
        variables = {"params": pG}
        if self.has_ema:
            variables["ema"] = ema
        method = VQVAE2.cycle_forward if cycle else None
        kw = dict(train=train, use_ema=use_ema)
        if not cycle:
            kw["encoder_detach"] = encoder_detach
        if train and self.has_ema:
            out, newv = self.models["G"].apply(
                variables, *args, mutable=["ema"], method=method, **kw
            )
            return out, newv["ema"]
        out = self.models["G"].apply(variables, *args, method=method, **kw)
        return out, ema

    def d_apply(self, pD, x, rng=None):
        kw = {}
        if rng is not None:
            kw = dict(deterministic=False, rngs={"dropout": rng})
        return self.models["D"].apply({"params": pD}, x, **kw)

    def c_apply(self, pC, x):
        return self.models["C"].apply({"params": pC}, x)

    def spkradv_apply(self, pA, encoded, detach=False):
        return self.models["SPKRADV"].apply(
            {"params": pA}, encoded, detach=detach
        )

    def get_D_inputs(self, batch, feats, pG, label="org"):
        """Concat feats [+uv] [+speaker code] (trainer_lsgan.py:194-206)."""
        parts = [feats]
        if self.conf["use_D_uv"]:
            parts.append(batch["uv"])
        if self.conf["use_D_spkrcode"]:
            if not self.conf["use_spkr_embedding"]:
                parts.append(batch[f"{label}_h_onehot"])
            else:
                h = _strip_ignore(batch[f"{label}_h"])
                table = pG["spkr_embedding"]["embedding"]
                parts.append(jax.lax.stop_gradient(jnp.take(table, h, axis=0)))
        return jnp.concatenate(parts, axis=-1).astype(jnp.float32)

    # ----------------------------- loss terms --------------------------- #

    def _ce_frames(self, logits, labels):
        return cross_entropy(
            logits.reshape(-1, logits.shape[-1]), labels.reshape(-1)
        )

    def vqvae_loss(self, batch, outputs, loss):
        """Reconstruction + VQ losses (trainer_vqvae.py:210-239)."""
        a = self.alpha
        emask, dmask = batch["encoder_mask"], batch["decoder_mask"]
        target, decoded = batch["out_feats"], outputs["decoded"]
        cs = self.causal_size
        loss["G_l1"] = feature_loss(decoded, target, dmask, "l1", self.causal, cs)
        loss["G_mse"] = feature_loss(decoded, target, dmask, "mse", self.causal, cs)
        loss["G_stft"] = multi_stft_loss(
            decoded, target, causal=self.causal, causal_size=cs, **self.stft_kw
        )
        loss["G"] = (
            loss.get("G", 0.0)
            + a["l1"] * loss["G_l1"]
            + a["mse"] * loss["G_mse"]
            + a["stft"] * loss["G_stft"]
        )
        for n in range(self.conf["n_vq_stacks"]):
            enc, emb = outputs["encoded"][n], outputs["emb_idx"][n]
            loss[f"G_commit{n}"] = masked_mean(
                (enc - jax.lax.stop_gradient(emb)) ** 2, emask
            )
            loss["G"] += a["commit"] * loss[f"G_commit{n}"]
            if not self.has_ema:
                loss[f"G_dict{n}"] = masked_mean(
                    (emb - jax.lax.stop_gradient(enc)) ** 2, emask
                )
                loss["G"] += a["dict"] * loss[f"G_dict{n}"]
        return loss

    def cycle_vqvae_loss(self, batch, cycle_outputs, loss, pC):
        """Cyclic constraint losses (trainer_vqvae.py:241-292)."""
        a = self.alpha
        ac = a["cycle"]
        for c, out_c in enumerate(cycle_outputs):
            for io in ("cv", "recon"):
                lbl = f"{c}cyc_{io}"
                o = out_c[io]
                if io == "cv":
                    emask = batch["encoder_mask"]
                    fake = self.c_apply(pC, o["decoded"])
                    loss[f"C_fake_{lbl}"] = self._ce_frames(fake, batch["cv_h"])
                    loss["G"] += ac * a["ce"] * loss[f"C_fake_{lbl}"]
                else:
                    emask = batch["cycle_encoder_mask"]
                    dmask = batch["cycle_decoder_mask"]
                    cs = self.causal_size * 2 if self.causal else 0
                    target, decoded = batch["in_feats"], o["decoded"]
                    loss[f"G_l1_{lbl}"] = feature_loss(
                        decoded, target, dmask, "l1", self.causal, cs
                    )
                    loss[f"G_mse_{lbl}"] = feature_loss(
                        decoded, target, dmask, "mse", self.causal, cs
                    )
                    loss[f"G_stft_{lbl}"] = multi_stft_loss(
                        decoded, target, causal=self.causal, causal_size=cs,
                        **self.stft_kw,
                    )
                    loss["G"] += ac * (
                        a["l1"] * loss[f"G_l1_{lbl}"]
                        + a["mse"] * loss[f"G_mse_{lbl}"]
                        + a["stft"] * loss[f"G_stft_{lbl}"]
                    )
                for n in range(self.conf["n_vq_stacks"]):
                    enc, emb = o["encoded"][n], o["emb_idx"][n]
                    loss[f"G_commit{n}_{lbl}"] = masked_mean(
                        (enc - jax.lax.stop_gradient(emb)) ** 2, emask
                    )
                    loss["G"] += ac * a["commit"] * loss[f"G_commit{n}_{lbl}"]
                    if not self.has_ema:
                        loss[f"G_dict{n}_{lbl}"] = masked_mean(
                            (emb - jax.lax.stop_gradient(enc)) ** 2, emask
                        )
                        loss["G"] += ac * a["dict"] * loss[f"G_dict{n}_{lbl}"]
        return loss

    def spkradv_g_loss(self, batch, outputs, loss, pA, label="org"):
        """Speaker-adversarial loss through the GRL, charged to G
        (trainer_vqvae.py:294-315)."""
        er = self.er
        encoded = [e[:, er:] for e in outputs["encoded_unmod"]]
        logits = self.spkradv_apply(pA, encoded, detach=False)
        loss[f"G_spkradv_{label}"] = self._ce_frames(
            logits, batch["org_h"][:, er:]
        )
        w = self.alpha["ce"]
        if label == "recon":
            w = self.alpha["cycle"] * w
        loss["G"] += w * loss[f"G_spkradv_{label}"]
        return loss

    def adv_loss(self, batch, decoded, h, mask, loss, pG, pD, rng):
        """LSGAN adversarial loss for G (trainer_lsgan.py:146-157)."""
        fake_inputs = self.get_D_inputs(batch, decoded, pG, label="cv")
        fake = self.d_apply(pD, fake_inputs, rng)
        if self.conf["acgan_flag"]:
            fake, spkr_cls = fake[..., :1], fake[..., 1:]
            loss = self.acgan_loss(spkr_cls, h, loss, label="adv", model="G")
        loss["D_adv"] = masked_mean((fake - 1.0) ** 2, mask)
        loss["G"] += self.alpha["adv"] * loss["D_adv"]
        return loss

    def acgan_loss(self, spkr_cls, h, loss, label="adv", model="G"):
        loss[f"D_acgan_{label}"] = self._ce_frames(spkr_cls, h)
        if not (self.conf["use_real_only_acgan"] and label == "fake"):
            loss[model] += self.alpha["acgan"] * loss[f"D_acgan_{label}"]
        return loss

    def discriminator_loss(self, sample, h, mask, loss, label="real",
                           weight=1.0):
        """One real/fake LSGAN term for D (trainer_lsgan.py:159-173);
        weight gates StarGAN's switch_update."""
        if self.conf["acgan_flag"]:
            sample, spkr_cls = sample[..., :1], sample[..., 1:]
            loss = self.acgan_loss(spkr_cls, h, loss, label=label, model="D")
        target = 1.0 if label == "real" else 0.0
        loss[f"D_{label}"] = masked_mean((sample - target) ** 2, mask)
        loss["D"] += weight * self.alpha[label] * loss[f"D_{label}"]
        return loss

    # ----------------------------- G updates ---------------------------- #

    def _g_args(self, batch, use_cvfeats=False, enc_cvfeats=None):
        """Generator args.  ``enc_cvfeats`` decouples the encoder's F0
        conditioning from the decoder's: the reference keeps enc_h on the
        org features wherever it converts — LSGAN adversarial forwards
        (trainer_lsgan.py:86,96-97,118-125) and dev/eval decoding
        (trainer_vqvae.py:75,107 via _get_enc_h with no cv args) — while
        dec_h switches to cv.  Defaults to following ``use_cvfeats``
        (both on cv) — the stargan conversion forwards use that default
        (reference trainer_stargan.py conditions both on cv); lsgan and
        dev/eval call sites pass ``enc_cvfeats=False`` explicitly."""
        if enc_cvfeats is None:
            enc_cvfeats = use_cvfeats
        dec_h, spkrvec = self.dec_h(batch, use_cvfeats)
        return (self.g_feats(batch), self.enc_h(batch, enc_cvfeats), dec_h,
                spkrvec)

    def _cycle_args(self, batch):
        dec_h, spkrvec = self.dec_h(batch)
        dec_h_cv, spkrvec_cv = self.dec_h(batch, use_cvfeats=True)
        return (self.g_feats(batch), self.enc_h(batch), dec_h,
                self.enc_h(batch, use_cvfeats=True), dec_h_cv,
                spkrvec, spkrvec_cv)

    def _opt_step(self, name, grads, params, opt):
        updates, new_opt = self.opts[name].update(
            grads, opt[name], params[name]
        )
        new_params = optax.apply_updates(params[name], updates)
        return {**params, name: new_params}, {**opt, name: new_opt}

    def update_G(self, mode: Mode, params, ema, opt, batch, rng, loss):
        conf = self.conf

        def loss_fn(pG, ema):
            lo = dict(loss)
            enc_aux = None
            if mode.gan_flag and mode.trainer_type == "cyclegan":
                outs, ema = self.g_forward(
                    pG, ema, self._cycle_args(batch), cycle=True
                )
                lo = self.vqvae_loss(batch, outs[0]["org"], lo)
                lo = self.cycle_vqvae_loss(batch, outs, lo, params.get("C"))
                enc_aux = outs[0]["org"]["encoded_unmod"]
                if conf["use_spkradv_training"]:
                    lo = self.spkradv_g_loss(
                        batch, outs[0]["org"], lo, params["SPKRADV"], "org"
                    )
                # adversarial loss on org and cv decodes
                mask = batch["decoder_mask"]
                for c, out_c in enumerate(outs):
                    for io in ("org", "cv"):
                        lbl = f"{c}cyc_{io}"
                        d_in = self.get_D_inputs(
                            batch, out_c[io]["decoded"], pG, label="cv"
                        )
                        d_out = self.d_apply(pD=params["D"], x=d_in, rng=rng)
                        if conf["acgan_flag"]:
                            d_out, spkr_cls = d_out[..., :1], d_out[..., 1:]
                            lo[f"D_acgan_adv_{lbl}"] = self._ce_frames(
                                spkr_cls, batch[f"{io}_h"]
                            )
                            lo["G"] += (
                                self.alpha["acgan"] * lo[f"D_acgan_adv_{lbl}"]
                            )
                            # reference masks D outputs only inside the
                            # acgan branch (trainer_cyclegan.py:108-115);
                            # without acgan the MSE runs over ALL frames
                            # including padding — reproduced for parity
                            lo[f"D_adv_{lbl}"] = masked_mean(
                                (d_out - 1.0) ** 2, mask
                            )
                        else:
                            lo[f"D_adv_{lbl}"] = jnp.mean((d_out - 1.0) ** 2)
                        lo["G"] += self.alpha["adv"] * lo[f"D_adv_{lbl}"]
            elif mode.gan_flag and mode.trainer_type == "stargan":
                outs, ema = self.g_forward(
                    pG, ema, self._cycle_args(batch), cycle=True
                )
                if conf["use_vqvae_loss"]:
                    lo = self.vqvae_loss(batch, outs[0]["org"], lo)
                lo = self.cycle_vqvae_loss(batch, outs, lo, params.get("C"))
                enc_aux = outs[0]["org"]["encoded_unmod"]
                if conf["use_spkradv_training"]:
                    for label in ("cv", "recon"):
                        lo = self.spkradv_g_loss(
                            batch, outs[0][label], lo, params["SPKRADV"], label
                        )
                lo = self.adv_loss(
                    batch, outs[0]["cv"]["decoded"], batch["cv_h"],
                    batch["decoder_mask"], lo, pG, params["D"], rng,
                )
            elif mode.gan_flag:  # lsgan
                outs, ema = self.g_forward(pG, ema, self._g_args(batch))
                lo = self.vqvae_loss(batch, outs, lo)
                enc_aux = outs["encoded_unmod"]
                if conf["use_spkradv_training"]:
                    lo = self.spkradv_g_loss(
                        batch, outs, lo, params["SPKRADV"], "org"
                    )
                use_cv = conf["cvadv_flag"]
                h = batch["cv_h"] if use_cv else batch["org_h"]
                adv_outs, ema = self.g_forward(
                    pG, ema,
                    self._g_args(batch, use_cvfeats=use_cv,
                                 enc_cvfeats=False),
                    use_ema=not conf["encoder_detach"],
                    encoder_detach=conf["encoder_detach"],
                )
                lo = self.adv_loss(
                    batch, adv_outs["decoded"], h, batch["decoder_mask"],
                    lo, pG, params["D"], rng,
                )
            elif mode.cycle_flag:
                outs, ema = self.g_forward(
                    pG, ema, self._cycle_args(batch), cycle=True
                )
                if conf["use_vqvae_loss"]:
                    lo = self.vqvae_loss(batch, outs[0]["org"], lo)
                lo = self.cycle_vqvae_loss(batch, outs, lo, params.get("C"))
                enc_aux = outs[0]["org"]["encoded_unmod"]
                if conf["use_spkradv_training"]:
                    for label in ("cv", "recon"):
                        lo = self.spkradv_g_loss(
                            batch, outs[0][label], lo, params["SPKRADV"], label
                        )
            else:
                outs, ema = self.g_forward(pG, ema, self._g_args(batch))
                lo = self.vqvae_loss(batch, outs, lo)
                enc_aux = outs["encoded_unmod"]
                if conf["use_spkradv_training"]:
                    lo = self.spkradv_g_loss(
                        batch, outs, lo, params["SPKRADV"], "org"
                    )
            if enc_aux is not None:
                enc_aux = [jax.lax.stop_gradient(e) for e in enc_aux]
            return lo["G"], (lo, ema, enc_aux)

        if mode.do_update and not mode.stop_generator:
            grads, (loss, ema, enc_aux) = jax.grad(loss_fn, has_aux=True)(
                params["G"], ema
            )
            params, opt = self._opt_step("G", grads, params, opt)
        else:
            _, (loss, ema, enc_aux) = loss_fn(params["G"], ema)
        return params, ema, opt, loss, enc_aux

    # ----------------------------- D updates ---------------------------- #

    def update_D(self, mode: Mode, params, ema, opt, batch, rng, loss):
        conf = self.conf
        k_drop, k_pick = jax.random.split(rng)

        def loss_fn(pD, ema):
            lo = dict(loss)
            mask = batch["decoder_mask"]
            if mode.trainer_type == "cyclegan":
                outs, ema = self.g_forward(
                    params["G"], ema, self._cycle_args(batch), cycle=True
                )
                real_in = self.get_D_inputs(
                    batch, batch["in_feats"], params["G"], "org"
                )
                orgf_in = self.get_D_inputs(
                    batch,
                    jax.lax.stop_gradient(outs[0]["org"]["decoded"]),
                    params["G"], "org",
                )
                cvf_in = self.get_D_inputs(
                    batch,
                    jax.lax.stop_gradient(outs[0]["cv"]["decoded"]),
                    params["G"], "cv",
                )
                d_out_all = {
                    "real": self.d_apply(pD, real_in, k_drop),
                    "org_fake": self.d_apply(
                        pD, orgf_in, jax.random.fold_in(k_drop, 1)
                    ),
                    "cv_fake": self.d_apply(
                        pD, cvf_in, jax.random.fold_in(k_drop, 2)
                    ),
                }
                pick_keys = jax.random.split(k_pick, conf["n_cycles"])
                for c in range(conf["n_cycles"]):
                    lbl = f"{c}cyc"
                    # the reference rebuilds `sample` fresh inside the
                    # cycle loop (trainer_cyclegan.py:129-143), so the
                    # acgan split below starts from the full D output
                    # every cycle (XLA CSEs the repeated forwards)
                    sample = dict(d_out_all)
                    if conf["acgan_flag"]:
                        for k in ("real", "org_fake", "cv_fake"):
                            h = batch["org_h"] if k != "cv_fake" else batch["cv_h"]
                            s, spkr_cls = sample[k][..., :1], sample[k][..., 1:]
                            sample = {**sample, k: s}
                            lo[f"D_ce_{k}_{lbl}"] = self._ce_frames(spkr_cls, h)
                            if not (conf["use_real_only_acgan"] and k == "org_fake"):
                                lo["D"] += (
                                    self.alpha["acgan"] * lo[f"D_ce_{k}_{lbl}"]
                                )
                    lo[f"D_real_{lbl}"] = masked_mean(
                        (sample["real"] - 1.0) ** 2, mask
                    )
                    # per-cycle random real-or-converted fake pick
                    # (reference re-draws random.choice each cycle, :166)
                    pick_org = jax.random.bernoulli(pick_keys[c])
                    fake = jnp.where(
                        pick_org, sample["org_fake"], sample["cv_fake"]
                    )
                    fmask = jnp.where(
                        pick_org, batch["cycle_decoder_mask"], mask
                    )
                    lo[f"D_fake_{lbl}"] = masked_mean(fake**2, fmask)
                    lo["D"] += (
                        self.alpha["fake"] * lo[f"D_fake_{lbl}"]
                        + self.alpha["real"] * lo[f"D_real_{lbl}"]
                    )
            elif mode.trainer_type == "stargan":
                if conf["switch_update"]:
                    pick = jax.random.bernoulli(k_pick)
                    w_real = pick.astype(jnp.float32)
                    w_fake = 1.0 - w_real
                else:
                    w_real = w_fake = 1.0
                real_in = self.get_D_inputs(
                    batch, batch["in_feats"], params["G"], "org"
                )
                lo = self.discriminator_loss(
                    self.d_apply(pD, real_in, k_drop), batch["org_h"], mask,
                    lo, "real", w_real,
                )
                outs, ema = self.g_forward(
                    params["G"], ema, self._g_args(batch, use_cvfeats=True)
                )
                fake_in = self.get_D_inputs(
                    batch, jax.lax.stop_gradient(outs["decoded"]),
                    params["G"], "cv",
                )
                lo = self.discriminator_loss(
                    self.d_apply(pD, fake_in, jax.random.fold_in(k_drop, 1)),
                    batch["cv_h"], mask,
                    lo, "fake", w_fake,
                )
            else:  # lsgan
                use_cv = conf["cvadv_flag"]
                h = batch["cv_h"] if use_cv else batch["org_h"]
                outs, ema = self.g_forward(
                    params["G"], ema,
                    self._g_args(batch, use_cvfeats=use_cv,
                                 enc_cvfeats=False),
                )
                real_in = self.get_D_inputs(
                    batch, batch["in_feats"], params["G"], "org"
                )
                lo = self.discriminator_loss(
                    self.d_apply(pD, real_in, k_drop), batch["org_h"], mask,
                    lo, "real",
                )
                fake_in = self.get_D_inputs(
                    batch, jax.lax.stop_gradient(outs["decoded"]),
                    params["G"], "cv",
                )
                lo = self.discriminator_loss(
                    self.d_apply(pD, fake_in, jax.random.fold_in(k_drop, 1)),
                    h, mask, lo, "fake"
                )
            return lo["D"], (lo, ema)

        if mode.do_update:
            grads, (loss, ema) = jax.grad(loss_fn, has_aux=True)(
                params["D"], ema
            )
            params, opt = self._opt_step("D", grads, params, opt)
        else:
            _, (loss, ema) = loss_fn(params["D"], ema)
        return params, ema, opt, loss

    # ------------------------- SPKRADV / C updates ---------------------- #

    def update_SPKRADV(self, mode: Mode, params, ema, opt, batch, rng, loss,
                       enc_aux=None):
        er = self.er
        # fast_spkradv (opt-in, conf key): reuse the pre-update G forward's
        # encodings from the G loss instead of a fresh post-update forward.
        # Saves one full G forward per step; the reference re-forwards with
        # the just-updated parameters (trainer_vqvae.py:163-184), so this is
        # a documented approximation, default off.
        fast = bool(self.conf.get("fast_spkradv", False)) and enc_aux is not None

        def loss_fn(pA, ema):
            if fast:
                enc_unmod = enc_aux
            else:
                outs, ema = self.g_forward(
                    params["G"], ema, self._g_args(batch)
                )
                enc_unmod = outs["encoded_unmod"]
            encoded = [e[:, er:] for e in enc_unmod]
            logits = self.spkradv_apply(pA, encoded, detach=True)
            lo = dict(loss)
            lo["SPKRADV"] = self.alpha["ce"] * self._ce_frames(
                logits, batch["org_h"][:, er:]
            )
            return lo["SPKRADV"], (lo, ema)

        if mode.do_update:
            grads, (loss, ema) = jax.grad(loss_fn, has_aux=True)(
                params["SPKRADV"], ema
            )
            params, opt = self._opt_step("SPKRADV", grads, params, opt)
        else:
            _, (loss, ema) = loss_fn(params["SPKRADV"], ema)
        return params, ema, opt, loss

    def update_C(self, mode: Mode, params, ema, opt, batch, rng, loss):
        def loss_fn(pC):
            lo = dict(loss)
            real = self.c_apply(pC, batch["in_feats"])
            lo["C_real"] = self._ce_frames(real, batch["org_h"])
            lo["C"] = lo.get("C", 0.0) + self.alpha["ce"] * lo["C_real"]
            return lo["C"], lo

        if mode.do_update:
            grads, loss = jax.grad(loss_fn, has_aux=True)(params["C"])
            params, opt = self._opt_step("C", grads, params, opt)
        else:
            _, loss = loss_fn(params["C"])
        return params, ema, opt, loss

    # ----------------------------- full steps --------------------------- #

    def make_step(self, mode: Mode):
        """Build (and cache) the jitted full step for a phase configuration."""
        if mode in self._cache:
            return self._cache[mode]
        conf = self.conf

        def step(state, batch, rng):
            params, ema, opt = state["params"], state["ema"], state["opt"]
            loss: Dict[str, Any] = {"G": 0.0, "D": 0.0, "C": 0.0, "SPKRADV": 0.0}
            keys = jax.random.split(rng, 4)
            if mode.gan_flag:
                if conf["train_first"] == "G":
                    params, ema, opt, loss, enc_aux = self.update_G(
                        mode, params, ema, opt, batch, keys[0], loss
                    )
                    params, ema, opt, loss = self.update_D(
                        mode, params, ema, opt, batch, keys[1], loss
                    )
                else:
                    params, ema, opt, loss = self.update_D(
                        mode, params, ema, opt, batch, keys[1], loss
                    )
                    params, ema, opt, loss, enc_aux = self.update_G(
                        mode, params, ema, opt, batch, keys[0], loss
                    )
            else:
                params, ema, opt, loss, enc_aux = self.update_G(
                    mode, params, ema, opt, batch, keys[0], loss
                )
            if conf["use_spkradv_training"]:
                params, ema, opt, loss = self.update_SPKRADV(
                    mode, params, ema, opt, batch, keys[2], loss,
                    enc_aux=enc_aux,
                )
            if conf["use_spkr_classifier"]:
                params, ema, opt, loss = self.update_C(
                    mode, params, ema, opt, batch, keys[3], loss
                )
            loss["objective"] = loss["G"] + loss["D"]
            new_state = {"params": params, "ema": ema, "opt": opt}
            return new_state, loss

        fn = jax.jit(step, donate_argnums=(0,))
        self._cache[mode] = fn
        return fn

    def make_forward(self, use_cvfeats=False):
        """Jitted conversion/reconstruction forward (no state mutation),
        cached per conditioning variant so repeated conversion calls reuse
        one compilation.

        Conditioning tensors (cv_lcf0 / spkr codes for an explicit target
        speaker) are prepared host-side and passed in the batch.
        """
        key = ("forward", use_cvfeats)
        if key in self._cache:
            return self._cache[key]

        @jax.jit
        def fwd(params, ema, batch):
            # encoder F0 conditioning stays on the ORG speaker even when
            # decoding toward an explicit cv target: the reference's
            # dev/eval flow calls _get_enc_h(batch) with neither
            # use_cvfeats nor cv_spkr_name (trainer_vqvae.py:75,107) —
            # only dec_h switches to the target
            args = self._g_args(batch, use_cvfeats=use_cvfeats,
                                enc_cvfeats=False)
            outs, _ = self.g_forward(
                params["G"], ema, args, train=False
            )
            return outs["decoded"]

        self._cache[key] = fwd
        return fwd
