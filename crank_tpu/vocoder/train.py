"""Vocoder training engine (jitted, data-parallel like the VC trainer).

Covers both roles of the reference's external PWG dependency: pretraining a
neural vocoder on natural (wav, mel) pairs, and fine-tuning it on the VC
model's stage-4 reconstructed features (run.sh stage 6 path).
"""

import logging
import random
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from crank_tpu.features.store import read_feature
from crank_tpu.models.discriminator import ConvDiscriminator
from crank_tpu.parallel.mesh import get_mesh, replicate, shard_batch
from crank_tpu.train.checkpoint import save_checkpoint
from crank_tpu.utils.audio_io import read_wav
from crank_tpu.vocoder.loss import multi_resolution_stft_loss
from crank_tpu.vocoder.model import PWGVocoder

def concat_aux_features(h5f, exts):
    """Read + concat conditioning features from one h5 (1-D keys get a
    trailing dim; lengths are trimmed to the shortest key)."""
    arrs = []
    for e in exts:
        a = np.asarray(read_feature(h5f, e), np.float32)
        if a.ndim == 1:
            a = a[:, None]
        arrs.append(a)
    t = min(a.shape[0] for a in arrs)
    return np.concatenate([a[:t] for a in arrs], axis=-1)


def aux_exts_for(conf, decoded=False):
    """Conditioning h5 keys for a recipe conf: the mel path conditions on
    the mel spectrogram; the mcep path on [mcep, lcf0, uv] (WORLD-feature
    WaveNet-vocoder convention)."""
    if conf.get("output_feat_type", "mlfb") == "mcep":
        return ("feats", "lcf0", "uv") if decoded else ("mcep", "lcf0", "uv")
    return ("feats",) if decoded else ("mlfb",)


def aux_channels_for(conf):
    fc = conf["feature"]
    if conf.get("output_feat_type", "mlfb") == "mcep":
        return fc["mcep_dim"] + 1 + 2  # mcep incl. 0th + lcf0 + uv
    return fc["mlfb_dim"]


DEFAULTS = {
    "batch_size": 8,
    "batch_max_frames": 100,       # segment length in mel frames
    "n_steps": 400000,
    "n_steps_save_model": 5000,
    "n_steps_print_loss": 100,
    "discriminator_train_start_steps": 100000,
    "lambda_adv": 4.0,
    "generator_lr": 1e-4,
    "discriminator_lr": 5e-5,
    "stft_fft_sizes": [1024, 2048, 512],
    "stft_hop_sizes": [120, 240, 50],
    "stft_win_sizes": [600, 1200, 240],
    "layers": 30,
    "stacks": 3,
    "upsample_strides": [8, 4, 4],
    "causal": False,  # strictly-causal convs -> streamable checkpoint
}


class VocoderDataset:
    """(wav segment, aligned aux-feature frames) pairs.

    Conditioning may come from the natural feats.scp ('mlfb' for the mel
    path; ('mcep', 'lcf0', 'uv') concatenated for the WORLD-feature path)
    or from decoded reconstruction dumps ('feats' / ('feats','lcf0','uv'))
    for fine-tuning.  ``ext`` takes a single h5 key or a tuple of keys
    concatenated along the feature axis (1-D keys get a trailing dim).
    """

    def __init__(self, wav_by_uid, feats_by_uid, hop_size,
                 batch_max_frames=100, ext="mlfb", seed=0):
        self.uids = [u for u in wav_by_uid if u in feats_by_uid]
        self.wavs = wav_by_uid
        self.feats = feats_by_uid
        self.hop = hop_size
        self.frames = batch_max_frames
        self.ext = (ext,) if isinstance(ext, str) else tuple(ext)
        self.rng = random.Random(seed)
        self._cache = {}

    def __len__(self):
        return len(self.uids)

    def _load(self, uid):
        if uid not in self._cache:
            x, fs = read_wav(self.wavs[uid])
            mel = concat_aux_features(self.feats[uid], self.ext)
            self._cache[uid] = (x.astype(np.float32), mel)
        return self._cache[uid]

    def sample(self):
        uid = self.rng.choice(self.uids)
        x, mel = self._load(uid)
        t_max = min(len(mel), len(x) // self.hop) - self.frames
        if t_max <= 0:
            mel = np.pad(mel, ((0, self.frames + 1 - len(mel)), (0, 0)))
            x = np.pad(x, (0, (self.frames + 1) * self.hop - len(x)))
            t0 = 0
        else:
            t0 = self.rng.randrange(t_max)
        m = mel[t0 : t0 + self.frames]
        w = x[t0 * self.hop : (t0 + self.frames) * self.hop]
        return w, m

    def batch(self, n):
        ws, ms = zip(*[self.sample() for _ in range(n)])
        return np.stack(ws), np.stack(ms).astype(np.float32)


class VocoderTrainer:
    def __init__(self, conf, expdir, mesh=None, seed=1234, resume_state=None):
        self.conf = {**DEFAULTS, **conf}
        self.expdir = Path(expdir)
        self.hit_memory_watchdog = False
        self.mesh = mesh or get_mesh()
        c = self.conf
        self.g = PWGVocoder(
            layers=c["layers"], stacks=c["stacks"],
            aux_channels=c.get("aux_channels", 80),
            upsample_strides=tuple(c["upsample_strides"]),
            causal=bool(c["causal"]),
        )
        self.d = ConvDiscriminator(out_channels=1, kernel_size=3, layers=10,
                                   conv_channels=64, dilation_factor=1)
        self.hop = self.g.hop_size
        L = c["batch_max_frames"] * self.hop
        key = jax.random.PRNGKey(seed)
        kg, kd = jax.random.split(key)
        if resume_state is None:
            from crank_tpu.train.factory import jit_init

            pg = jit_init(
                self.g, kg, jnp.zeros((1, L)),
                jnp.zeros((1, c["batch_max_frames"],
                           c.get("aux_channels", 80))),
            )["params"]
            pd = jit_init(self.d, kd, jnp.zeros((1, L, 1)))["params"]
            self.opt_g = optax.adam(c["generator_lr"])
            self.opt_d = optax.adam(c["discriminator_lr"])
            state = {
                "params": {"G": pg, "D": pd},
                "ema": {},
                "opt": {"G": self.opt_g.init(pg), "D": self.opt_d.init(pd)},
            }
            self.steps = 0
        else:
            self.opt_g = optax.adam(c["generator_lr"])
            self.opt_d = optax.adam(c["discriminator_lr"])
            state = {k: resume_state[k] for k in ("params", "ema", "opt")}
            self.steps = resume_state["steps"]
        self.state = {k: replicate(v, self.mesh) for k, v in state.items()}
        self.rng = jax.random.PRNGKey(seed + 17)
        self._steps_cache = {}

    # ------------------------------------------------------------------ #

    def _make_step(self, adv: bool):
        if adv in self._steps_cache:
            return self._steps_cache[adv]
        c = self.conf
        stft_kw = dict(
            fft_sizes=tuple(c["stft_fft_sizes"]),
            hop_sizes=tuple(c["stft_hop_sizes"]),
            win_sizes=tuple(c["stft_win_sizes"]),
        )

        def step(state, wav, mel, rng):
            params, opt = state["params"], state["opt"]
            kz, kd = jax.random.split(rng)
            z = jax.random.normal(kz, wav.shape)

            def g_loss(pg):
                y_hat = self.g.apply({"params": pg}, z, mel)
                sc, lm = multi_resolution_stft_loss(y_hat, wav, **stft_kw)
                loss = sc + lm
                logs = {"spectral_convergence": sc, "log_stft_magnitude": lm}
                if adv:
                    fake = self.d.apply({"params": params["D"]},
                                        y_hat[..., None])
                    adv_loss = jnp.mean((fake - 1.0) ** 2)
                    loss = loss + c["lambda_adv"] * adv_loss
                    logs["adversarial"] = adv_loss
                logs["G"] = loss
                return loss, (logs, y_hat)

            grads, (logs, y_hat) = jax.grad(g_loss, has_aux=True)(params["G"])
            upd, og = self.opt_g.update(grads, opt["G"], params["G"])
            params = {**params, "G": optax.apply_updates(params["G"], upd)}
            opt = {**opt, "G": og}

            if adv:
                def d_loss(pd):
                    real = self.d.apply({"params": pd}, wav[..., None])
                    fake = self.d.apply(
                        {"params": pd},
                        jax.lax.stop_gradient(y_hat)[..., None],
                    )
                    return jnp.mean((real - 1.0) ** 2) + jnp.mean(fake**2)

                dgrads = jax.grad(d_loss)(params["D"])
                upd, od = self.opt_d.update(dgrads, opt["D"], params["D"])
                params = {**params, "D": optax.apply_updates(params["D"], upd)}
                opt = {**opt, "D": od}
                logs["D"] = d_loss(params["D"])
            return {"params": params, "ema": {}, "opt": opt}, logs

        fn = jax.jit(step, donate_argnums=(0,))
        self._steps_cache[adv] = fn
        return fn

    def _prefetch(self, dataset, n, depth=2):
        """Device batches shipped `depth` ahead so H2D overlaps compute
        (same pattern as the main Trainer loop)."""
        import collections

        c = self.conf
        queue = collections.deque()
        for _ in range(n):
            wav, mel = dataset.batch(c["batch_size"])
            queue.append(shard_batch({"wav": wav, "mel": mel}, self.mesh))
            if len(queue) >= depth:
                yield queue.popleft()
        while queue:
            yield queue.popleft()

    def train(self, dataset, n_steps=None):
        c = self.conf
        n_data = self.mesh.shape["data"]
        if c["batch_size"] % n_data != 0:
            # fail fast like the VC trainer: a non-divisible batch would
            # surface as an opaque device_put sharding error mid-training.
            # Checked here, not in __init__: decode-only construction
            # (bin/vocoder_decode) is per-utterance and batch-free, so it
            # must not care about the training batch geometry.
            raise ValueError(
                f"vocoder batch_size={c['batch_size']} must be a multiple "
                f"of the {n_data}-device data-parallel axis"
            )
        n_steps = n_steps or c["n_steps"]
        for batch in self._prefetch(dataset, max(0, n_steps - self.steps)):
            self.rng, k = jax.random.split(self.rng)
            adv = self.steps > c["discriminator_train_start_steps"]
            step_fn = self._make_step(adv)
            self.state, logs = step_fn(self.state, batch["wav"],
                                       batch["mel"], k)
            if self.steps % c["n_steps_print_loss"] == 0:
                # deadline-guarded readback: converts a wedged tunnel into
                # DeviceLostError -> exit 76 -> stage-runner probe-wait
                from crank_tpu.parallel.mesh import fetch_replicated

                logs = fetch_replicated(logs)
                logging.info(
                    "vocoder step %d: %s", self.steps,
                    {k: round(float(v), 4) for k, v in logs.items()},
                )
                if self._memory_watchdog():
                    self.steps += 1
                    break
            self.steps += 1
            if self.steps % c["n_steps_save_model"] == 0:
                self.save()
        self.save()

    def _memory_watchdog(self):
        """Checkpoint-and-relaunch when host RSS crosses the ceiling (same
        segmented-training mechanism as the main Trainer; some runtimes
        retain host memory per H2D transfer)."""
        limit = self.conf.get("max_host_rss_gb", 64)
        if not limit:
            return False
        try:
            with open("/proc/self/status") as fp:
                rss = next(
                    int(ln.split()[1]) / 1048576
                    for ln in fp if ln.startswith("VmRSS")
                )
        except (OSError, StopIteration):
            return False
        if jax.process_count() > 1:
            # collective stop decision (max RSS across hosts) — a one-sided
            # exit would leave the other hosts hung in the next all-reduce
            # (same rule as Trainer._check_memory_watchdog)
            from jax.experimental import multihost_utils

            rss = float(
                np.max(multihost_utils.process_allgather(np.float32(rss)))
            )
        if rss > limit:
            logging.warning(
                "host RSS above %.0f GB at vocoder step %d: checkpointing "
                "and requesting relaunch", limit, self.steps,
            )
            self.hit_memory_watchdog = True
            return True
        return False

    def save(self):
        if jax.process_index() != 0:
            return  # one writer per cluster (state is replicated)
        save_checkpoint(self.expdir, {
            "steps": self.steps, "rng": self.rng, **self.state,
        })

    def decode_mel(self, mel, seed=0):
        """mel [T, aux] -> waveform [T*hop] (one jitted forward)."""
        mel = jnp.asarray(mel, jnp.float32)[None]
        t = mel.shape[1]
        t_pad = -(-t // 64) * 64
        mel = jnp.pad(mel, ((0, 0), (0, t_pad - t), (0, 0)))
        z = jax.random.normal(jax.random.PRNGKey(seed),
                              (1, t_pad * self.hop))
        y = self.g.apply({"params": self.state["params"]["G"]}, z, mel)
        return np.asarray(y[0][: t * self.hop])
