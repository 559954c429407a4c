"""Device-resident training batches: HBM feature banks + on-device assembly.

TPU-first replacement for the host batch pipeline.  The reference feeds
training through torch DataLoader workers that assemble every batch on the
host and ship it whole over the interconnect each step
(/root/reference/crank/net/trainer/dataset.py + basetrainer.py); the
round-2/3 production runs here showed that on a small host this pipeline —
not the accelerator — paces training (device step 4-28 ms vs 160-200 ms
host/wire per step at the 50x500x80 geometry, ~20 MB/step H2D).

Here the whole normalized training set — the same zero-padded [N, Tmax, D]
banks VectorizedLoader builds — is ``device_put`` ONCE (replicated over the
mesh), and each step ships five [B] int32 vectors (utterance ids, crop
offsets, org/cv speaker ids, frame lengths).  Crop gathers, validity masks,
one-hot conditioning, the cv-F0 affine transform, the mcep-0th split and the
excit concat all run inside one jitted program whose outputs are sharded
over the 'data' mesh axis, so batch assembly happens at HBM bandwidth on the
accelerator and pipelines behind the previous train step's compute.

Sampling parity: the batch *plan* (epoch permutation, crop offsets, cv
speakers) is drawn on the host by VectorizedLoader._sample_plan from the
loader's own RNG, so a run with ``device_loader: true`` consumes the
IDENTICAL sampling stream as the host vectorized loader — only where the
gather executes changes.  test_device_loader.py asserts batch equality
key-for-key against the host path.

Eligibility (``device_loader: auto``, the default): single JAX process,
bank cache enabled, no raw-waveform path, no SpecAugment (both keep the
host vectorized loader; raw banks are waveform-rate and SpecAugment is a
per-sample host transform).  ``device_loader: true`` forces (and raises on
an ineligible conf), ``false`` disables.
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np

from crank_tpu.parallel.mesh import batch_sharding, replicated
from crank_tpu.train.dataset import IGNORE_INDEX, VectorizedLoader


def eligible(conf, loader) -> bool:
    if not isinstance(loader, VectorizedLoader):
        return False
    if jax.process_count() > 1:
        return False
    if conf.get("use_raw") or conf.get("use_sinc_conv"):
        return False
    if conf.get("spec_augment") and conf.get("n_spec_augment", 0):
        return False
    return True


def maybe_device_loader(loader, mesh, conf):
    """Wrap a train loader for on-device assembly per the conf switch."""
    mode = conf.get("device_loader", "auto")
    if mode is False or getattr(loader, "device_resident", False):
        return loader
    ok = eligible(conf, loader)
    if mode == "auto":
        if not ok:
            return loader
    elif not ok:
        raise ValueError(
            "device_loader: true requires a single-process run with the "
            "cached (vectorized) loader and no raw/SpecAugment path"
        )
    return DeviceResidentLoader(loader, mesh, conf)


class DeviceResidentLoader:
    """Iterates device-resident, 'data'-sharded training batches."""

    device_resident = True

    def __init__(self, vloader: VectorizedLoader, mesh, conf):
        self.vl = vloader
        self.mesh = mesh
        self.conf = conf
        self._ready = False

    def __len__(self):
        return len(self.vl)

    # -- one-time bank upload + jit construction ------------------------
    def _setup(self):
        vl = self.vl
        if not vl._built:
            vl._build()
        ds = vl.ds
        conf = self.conf
        rep = replicated(self.mesh)
        out_sh = batch_sharding(self.mesh)

        feats = sorted(ds.features - {"raw"})
        self._banks = {
            k: jax.device_put(vl.bank[k], rep) for k in feats
        }
        self._lcf0_raw = jax.device_put(vl.bank["lcf0_raw"], rep)
        self._f0_mean = jax.device_put(vl.f0_mean, rep)
        self._f0_std = jax.device_put(vl.f0_std, rep)

        L = vl.L
        S = ds.n_spkrs
        in_t = conf["input_feat_type"]
        out_t = conf["output_feat_type"]
        split_0th = "mcep" in feats and not conf.get("use_mcep_0th", False)
        want_excit = "excit" in (in_t, out_t)

        def assemble(banks, lcf0_raw, f0_mean, f0_std,
                     idxs, p, org, cv, flen):
            t_idx = p[:, None] + jnp.arange(L, dtype=jnp.int32)  # [B, L]
            valid = t_idx < flen[:, None]                        # [B, L]
            rows = idxs[:, None]
            b = {k: banks[k][rows, t_idx] for k in feats}

            raw = lcf0_raw[rows, t_idx]
            mask = valid[:, :, None].astype(jnp.float32)
            cv_lcf0 = (
                (raw - f0_mean[org][:, None, None])
                / f0_std[org][:, None, None]
                * f0_std[cv][:, None, None]
                + f0_mean[cv][:, None, None]
            ) * mask  # padded frames carry cv_lcf0 == 0.0 (host-loader parity)

            if split_0th:
                b["mcep"] = b["mcep"][..., 1:]
            if want_excit:
                b["excit"] = jnp.concatenate(
                    [b["lcf0"], b["uv"], b["cap"]], axis=-1
                )

            eye = jnp.eye(S, dtype=jnp.float32)
            org_h = jnp.where(valid, org[:, None], IGNORE_INDEX)
            cv_h = jnp.where(valid, cv[:, None], IGNORE_INDEX)
            out = {
                "lcf0": b["lcf0"],
                "uv": b["uv"],
                "cv_lcf0": cv_lcf0,
                "org_h": org_h,
                "cv_h": cv_h,
                "org_h_onehot": jnp.broadcast_to(
                    eye[org][:, None, :], (org.shape[0], L, S)
                ),
                "cv_h_onehot": jnp.broadcast_to(
                    eye[cv][:, None, :], (cv.shape[0], L, S)
                ),
                "in_feats": b[in_t],
                "out_feats": b[in_t] if out_t == in_t else b[out_t],
            }
            for m in ("encoder_mask", "decoder_mask",
                      "cycle_encoder_mask", "cycle_decoder_mask"):
                out[m] = mask
            return out

        self._assemble = jax.jit(
            assemble, in_shardings=rep, out_shardings=out_sh
        )
        self._ready = True
        nbytes = sum(v.nbytes for v in self._banks.values())
        logging.info(
            "device loader: %d utterances, %.1f MB of banks resident on "
            "device, on-device batch assembly enabled",
            len(ds), nbytes / 1e6,
        )

    def _batch(self, idxs):
        vl = self.vl
        # jit-traceable batch only (DEVICE_KEYS shape): the training step
        # never consumes the host-side label strings the per-item loader
        # carries, so none are attached here.
        return self._assemble(
            self._banks, self._lcf0_raw, self._f0_mean, self._f0_std,
            *self._plan(idxs),
        )

    def _plan(self, idxs):
        p, org, cv, flen = self.vl._sample_plan(idxs)
        return (idxs.astype(np.int32), p.astype(np.int32),
                org.astype(np.int32), cv.astype(np.int32),
                flen.astype(np.int32))

    # -- fused-step protocol (the production path) ----------------------
    #
    # The trainer fuses batch assembly INTO the train-step program
    # (trainer._fused_step): each step's jit takes the resident banks plus
    # five [B] int32 vectors and builds the batch inside the same XLA
    # program that consumes it.  One dispatch per step, the crop gathers
    # fuse into their consumers, and no executable ever consumes another
    # executable's output buffers — which the experimental tunnel backend
    # was observed to kernel-fault on for the large gan-phase program
    # (docs/DEVICE_LOADER.md).  assemble_fn stays independently jitted for
    # the standalone-batch path (tests, bench warm-up); calling it inside
    # an outer jit inlines it into the caller's program.

    @property
    def assemble_fn(self):
        if not self._ready:
            self._setup()
        return self._assemble

    @property
    def bank_args(self):
        if not self._ready:
            self._setup()
        return (self._banks, self._lcf0_raw, self._f0_mean, self._f0_std)

    def iter_plans(self):
        """Per-batch host-side sampling plans ([B] int32 vectors)."""
        if not self._ready:
            self._setup()
        vl = self.vl
        idx = vl.rng.permutation(len(vl.ds))
        for bi in range(len(self)):
            yield self._plan(
                idx[bi * vl.batch_size : (bi + 1) * vl.batch_size]
            )

    def __iter__(self):
        if not self._ready:
            self._setup()
        vl = self.vl
        idx = vl.rng.permutation(len(vl.ds))
        for bi in range(len(self)):
            yield self._batch(
                idx[bi * vl.batch_size : (bi + 1) * vl.batch_size]
            )
