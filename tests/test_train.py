"""End-to-end training-engine tests on a virtual 8-device CPU mesh.

These cover what the reference never tested (SURVEY.md §4 implication):
actual train steps for every trainer type, phase switches, dev steps,
checkpoint round-trips and the data pipeline — all data-parallel over 8
virtual devices.
"""

import pickle
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crank_tpu.features.scaler import StandardScaler
from crank_tpu.features.store import write_features
from crank_tpu.parallel.mesh import get_mesh
from crank_tpu.train.checkpoint import (
    find_latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from crank_tpu.train.dataset import (
    VCDataset,
    DataLoader,
    collate,
    get_dataloaders,
    select_device_batch,
)
from crank_tpu.train.factory import build_models, init_models
from crank_tpu.train.optim import make_optimizers
from crank_tpu.train.steps import Mode, StepFactory
from crank_tpu.train.trainer import Trainer

DIM = 16
BATCH_LEN = 32
BATCH_SIZE = 8
SPKRS = ["SF1", "SM1", "TF2"]


def make_conf(**kw):
    conf = {
        "feature": {
            "label": "mlfb", "fs": 22050, "fftl": 256, "win_length": 256,
            "hop_size": 64, "window_types": ["hann"], "fmin": 80,
            "fmax": 7600, "mlfb_dim": DIM, "n_iteration": 4, "framems": 20,
            "shiftms": 5.80499, "mcep_dim": 10, "mcep_alpha": 0.466,
        },
        "trainer_type": "vqvae",
        "input_feat_type": "mlfb",
        "output_feat_type": "mlfb",
        "use_raw": False,
        "use_preprocessed_scaler": False,
        "use_sinc_conv": False,
        "raw_window_type": "hann",
        "input_size": DIM,
        "output_size": DIM,
        "n_steps": 2,
        "dev_steps": 2,
        "n_steps_save_model": 2,
        "n_steps_print_loss": 1,
        "batch_size": BATCH_SIZE,
        "batch_len": BATCH_LEN,
        "cache_dataset": True,
        "spec_augment": False,
        "n_spec_augment": 0,
        "use_mcep_0th": False,
        "ignore_scaler": ["raw", "mcep"],
        "alpha": {
            "l1": 2, "mse": 0, "stft": 1, "commit": 0.25, "dict": 0.5,
            "cycle": 0.1, "ce": 1, "adv": 1, "real": 0.5, "fake": 0.5,
            "acgan": 1,
        },
        "stft_params": {
            "fft_sizes": [16, 32], "win_sizes": [16, 32],
            "hop_sizes": [8, 16], "logratio": 0,
        },
        "optim": {
            m: {"type": "adam", "lr": 1e-3, "decay_size": 0.5,
                "decay_step_size": 1000, "clip_grad_norm": 0.0}
            for m in ("G", "D", "C", "SPKRADV")
        },
        "encoder_f0": False,
        "decoder_f0": True,
        "encoder_energy": False,
        "decoder_energy": False,
        "causal": False,
        "causal_size": 0,
        "use_spkr_embedding": True,
        "spkr_embedding_size": 8,
        "ema_flag": True,
        "n_vq_stacks": 2,
        "n_layers_stacks": [2, 2, 2],
        "n_layers": [1, 1, 1],
        "kernel_size": [3, 3, 3],
        "emb_dim": [8, 8, 8],
        "emb_size": [16, 16, 16],
        "use_spkradv_training": True,
        "n_spkradv_layers": 2,
        "spkradv_kernel_size": 3,
        "spkradv_lambda": 0.1,
        "use_spkr_classifier": True,
        "n_spkr_classifier_layers": 2,
        "spkr_classifier_kernel_size": 3,
        "use_cyclic_training": False,
        "n_steps_cycle_start": 0,
        "n_cycles": 1,
        "n_steps_gan_start": 0,
        "gan_type": "lsgan",
        "use_residual_network": True,
        "n_discriminator_layers": 1,
        "n_discriminator_stacks": 2,
        "discriminator_kernel_size": 3,
        "discriminator_dropout": 0.25,
        "train_first": "D",
        "switch_update": False,
        "cvadv_flag": False,
        "acgan_flag": False,
        "encoder_detach": False,
        "use_real_only_acgan": False,
        "use_D_uv": True,
        "use_D_spkrcode": True,
        "use_vqvae_loss": True,
        "n_steps_stop_generator": 0,
    }
    conf.update(kw)
    return conf


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Synthetic corpus: h5 features + scaler + scp for 3 speakers."""
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(7)
    scp = {}
    scaler = {"mlfb": StandardScaler(), "lcf0": StandardScaler()}
    for spkr in SPKRS:
        scaler[spkr] = {"lcf0": StandardScaler()}
    feats_by_phase = {"train": {}, "dev": {}, "eval": {}}
    for spkr in SPKRS:
        base_f0 = {"SF1": 5.2, "SM1": 4.6, "TF2": 5.4}[spkr]
        for i in range(6):
            T = int(rng.integers(40, 90))
            mlfb = rng.standard_normal((T, DIM)).astype(np.float32)
            lcf0 = (base_f0 + 0.1 * rng.standard_normal((T, 1))).astype(
                np.float32
            )
            uv = (rng.random((T, 1)) > 0.2).astype(np.float32)
            h5f = root / "feat" / spkr / f"{spkr}_{i:03d}.h5"
            write_features(h5f, {"mlfb": mlfb, "lcf0": lcf0, "uv": uv})
            scaler["mlfb"].partial_fit(mlfb)
            scaler["lcf0"].partial_fit(lcf0)
            scaler[spkr]["lcf0"].partial_fit(lcf0)
            uid = f"{spkr}_{i:03d}"
            phase = "train" if i < 4 else ("dev" if i == 4 else "eval")
            feats_by_phase[phase][uid] = str(h5f)
    for phase in feats_by_phase:
        scp[phase] = {
            "feats": feats_by_phase[phase],
            "spkrs": SPKRS,
        }
    return {"scp": scp, "scaler": scaler, "root": root}


def _setup(conf, corpus):
    models = build_models(conf, spkr_size=len(SPKRS))
    params, ema = init_models(
        models, conf, len(SPKRS), jax.random.PRNGKey(0), B=2, T=BATCH_LEN
    )
    opts = make_optimizers(conf, list(models.keys()))
    opt_state = {m: opts[m].init(params[m]) for m in models}
    factory = StepFactory(conf, models, opts, spkr_size=len(SPKRS))
    state = {"params": params, "ema": ema, "opt": opt_state}
    return models, factory, state


def _batch(conf, corpus, seed=0):
    ds = VCDataset(conf, corpus["scp"], corpus["scaler"], phase="train",
                   seed=seed)
    return select_device_batch(collate([ds[i % len(ds)] for i in range(BATCH_SIZE)]))


def _leaf_delta(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return max(
        float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
        for x, y in zip(la, lb)
    )


def test_dataset_batch_shapes(corpus):
    conf = make_conf()
    ds = VCDataset(conf, corpus["scp"], corpus["scaler"], phase="train", seed=0)
    batch = collate([ds[i % len(ds)] for i in range(BATCH_SIZE)])
    assert batch["in_feats"].shape == (BATCH_SIZE, BATCH_LEN, DIM)
    assert batch["lcf0"].shape == (BATCH_SIZE, BATCH_LEN, 1)
    assert batch["org_h"].shape == (BATCH_SIZE, BATCH_LEN)
    assert batch["encoder_mask"].dtype == bool
    # ignore-index padding on label sequences for short utterances
    short = batch["flen"] < BATCH_LEN
    if short.any():
        i = int(np.argmax(short))
        assert batch["org_h"][i, -1] == -100
    # cv speaker differs from org
    for o, c in zip(batch["org_spkr_name"], batch["cv_spkr_name"]):
        assert o != c


def test_vqvae_train_step(corpus):
    conf = make_conf()
    models, factory, state = _setup(conf, corpus)
    batch = _batch(conf, corpus)
    step = factory.make_step(Mode(trainer_type="vqvae"))
    p0 = jax.device_get(state["params"]["G"])
    cb0 = jax.device_get(state["ema"]["quantizer_0"]["codebook"])
    state, loss = step(state, batch, jax.random.PRNGKey(1))
    loss = jax.device_get(loss)
    for k in ("G", "G_l1", "G_stft", "G_commit0", "SPKRADV", "C"):
        assert np.isfinite(float(loss[k])), k
    assert _leaf_delta(p0, jax.device_get(state["params"]["G"])) > 0
    cb1 = jax.device_get(state["ema"]["quantizer_0"]["codebook"])
    assert not np.allclose(cb0, cb1)


def test_dev_step_no_update(corpus):
    conf = make_conf()
    models, factory, state = _setup(conf, corpus)
    batch = _batch(conf, corpus)
    step = factory.make_step(Mode(trainer_type="vqvae", do_update=False))
    p0 = jax.device_get(state["params"])
    state, loss = step(state, batch, jax.random.PRNGKey(1))
    assert _leaf_delta(p0, jax.device_get(state["params"])) == 0.0


@pytest.mark.parametrize("ttype", ["lsgan", "cyclegan", "stargan"])
def test_gan_train_steps(corpus, ttype):
    conf = make_conf(trainer_type=ttype)
    models, factory, state = _setup(conf, corpus)
    assert "D" in models
    batch = _batch(conf, corpus)
    step = factory.make_step(Mode(trainer_type=ttype, gan_flag=True))
    d0 = jax.device_get(state["params"]["D"])
    state, loss = step(state, batch, jax.random.PRNGKey(2))
    loss = jax.device_get(loss)
    assert np.isfinite(float(loss["G"]))
    assert np.isfinite(float(loss["D"]))
    assert float(loss["D_real"] if ttype != "cyclegan" else
                 loss["D_real_0cyc"]) > 0
    assert _leaf_delta(d0, jax.device_get(state["params"]["D"])) > 0


def test_cycle_train_step(corpus):
    conf = make_conf(use_cyclic_training=True)
    models, factory, state = _setup(conf, corpus)
    batch = _batch(conf, corpus)
    step = factory.make_step(Mode(trainer_type="vqvae", cycle_flag=True))
    state, loss = step(state, batch, jax.random.PRNGKey(3))
    loss = jax.device_get(loss)
    assert np.isfinite(float(loss["G"]))
    assert "G_l1_0cyc_recon" in loss and "C_fake_0cyc_cv" in loss


def test_non_ema_dict_loss(corpus):
    conf = make_conf(ema_flag=False)
    models, factory, state = _setup(conf, corpus)
    assert state["ema"] == {}
    batch = _batch(conf, corpus)
    step = factory.make_step(Mode(trainer_type="vqvae"))
    cb0 = jax.device_get(
        state["params"]["G"]["quantizer_0"]["codebook"])
    state, loss = step(state, batch, jax.random.PRNGKey(4))
    assert "G_dict0" in jax.device_get(loss)
    cb1 = jax.device_get(state["params"]["G"]["quantizer_0"]["codebook"])
    assert not np.allclose(cb0, cb1)  # gradient-trained codebook moved


def test_checkpoint_roundtrip(tmp_path, corpus):
    conf = make_conf()
    models, factory, state = _setup(conf, corpus)
    full = {"steps": 5, "rng": jax.random.PRNGKey(0), **state}
    path = save_checkpoint(tmp_path, full)
    assert path.name == "checkpoint_5steps.pkl"
    loaded = load_checkpoint(path)
    assert loaded["steps"] == 5
    assert _leaf_delta(loaded["params"], jax.device_get(state["params"])) == 0
    assert find_latest_checkpoint(tmp_path) == path


def test_trainer_end_to_end(tmp_path, corpus):
    """Two full train steps + dev + checkpoint via the Trainer driver."""
    conf = make_conf(n_steps=2, dev_steps=2, n_steps_save_model=2)
    models = build_models(conf, spkr_size=len(SPKRS))
    params, ema = init_models(models, conf, len(SPKRS),
                              jax.random.PRNGKey(0), B=2, T=BATCH_LEN)
    opts = make_optimizers(conf, list(models.keys()))
    state = {"params": params, "ema": ema,
             "opt": {m: opts[m].init(params[m]) for m in models}}
    loaders = get_dataloaders(conf, corpus["scp"], corpus["scaler"],
                              flag="train")
    tr = Trainer(models, opts, conf, loaders, corpus["scaler"],
                 expdir=tmp_path, init_state=state, mesh=get_mesh())
    tr.run("train")
    assert tr.steps == conf["n_steps"] + 1
    assert find_latest_checkpoint(tmp_path) is not None
    # dev conversion wavs were written
    assert list((tmp_path / "dev_wav").rglob("*.wav"))


def test_trainer_eval(tmp_path, corpus):
    conf = make_conf()
    models = build_models(conf, spkr_size=len(SPKRS))
    loaders = get_dataloaders(conf, corpus["scp"], corpus["scaler"],
                              flag="eval")
    T_eval = loaders["batch_len"]
    params, ema = init_models(models, conf, len(SPKRS),
                              jax.random.PRNGKey(0), B=2, T=T_eval)
    opts = make_optimizers(conf, list(models.keys()))
    state = {"params": params, "ema": ema,
             "opt": {m: opts[m].init(params[m]) for m in models}}
    tr = Trainer(models, opts, conf, loaders, corpus["scaler"],
                 expdir=tmp_path, init_state=state, mesh=get_mesh())
    tr.run("eval")
    h5s = list((tmp_path / "eval_wav").rglob("*.h5"))
    assert len(h5s) > 0
    import h5py

    with h5py.File(h5s[0], "r") as fp:
        for k in ("feats", "normed_feat", "f0", "lcf0", "normed_lcf0", "uv"):
            assert k in fp


def test_memory_watchdog_checkpoints_and_stops(tmp_path, corpus):
    """Segmented training: when host RSS crosses max_host_rss_gb, the trainer
    checkpoints, stops, and flags for relaunch (exit 75 in the CLI) — the
    defense against runtimes that retain host memory per H2D transfer."""
    conf = make_conf(n_steps=50, dev_steps=1000, n_steps_save_model=1000,
                     n_steps_print_loss=1, max_host_rss_gb=0.001)
    models = build_models(conf, spkr_size=len(SPKRS))
    params, ema = init_models(models, conf, len(SPKRS),
                              jax.random.PRNGKey(0), B=2, T=BATCH_LEN)
    opts = make_optimizers(conf, list(models.keys()))
    state = {"params": params, "ema": ema,
             "opt": {m: opts[m].init(params[m]) for m in models}}
    loaders = get_dataloaders(conf, corpus["scp"], corpus["scaler"],
                              flag="train")
    tr = Trainer(models, opts, conf, loaders, corpus["scaler"],
                 expdir=tmp_path, init_state=state, mesh=get_mesh())
    tr.run("train")
    assert tr.hit_memory_watchdog
    assert tr.steps < conf["n_steps"]  # stopped early
    assert find_latest_checkpoint(tmp_path) is not None


def test_sigterm_preemption_checkpoints_and_stops(tmp_path, corpus):
    """Preemption-safe resume: a SIGTERM mid-training (pod eviction
    notice) checkpoints at the next step boundary and flags for relaunch
    (exit 75 via the CLI), instead of dying with the segment lost.  Uses
    real async signal delivery on the main thread, the same wiring
    bin/train.py installs."""
    import os
    import signal
    import threading

    conf = make_conf(n_steps=500, dev_steps=10000, n_steps_save_model=10000,
                     n_steps_print_loss=1, max_host_rss_gb=10000)
    models = build_models(conf, spkr_size=len(SPKRS))
    params, ema = init_models(models, conf, len(SPKRS),
                              jax.random.PRNGKey(0), B=2, T=BATCH_LEN)
    opts = make_optimizers(conf, list(models.keys()))
    state = {"params": params, "ema": ema,
             "opt": {m: opts[m].init(params[m]) for m in models}}
    loaders = get_dataloaders(conf, corpus["scp"], corpus["scaler"],
                              flag="train")
    tr = Trainer(models, opts, conf, loaders, corpus["scaler"],
                 expdir=tmp_path, init_state=state, mesh=get_mesh())
    prev = signal.signal(signal.SIGTERM, tr.request_preempt_checkpoint)
    try:
        timer = threading.Timer(1.5, os.kill, (os.getpid(), signal.SIGTERM))
        timer.start()
        tr.run("train")
        timer.cancel()
    finally:
        signal.signal(signal.SIGTERM, prev)
    assert tr.preempt_requested
    assert tr.hit_memory_watchdog  # relaunch-requested path (exit 75)
    assert tr.steps < conf["n_steps"]  # stopped early
    ckpt = find_latest_checkpoint(tmp_path)
    assert ckpt is not None
    from crank_tpu.train.checkpoint import load_checkpoint

    assert load_checkpoint(ckpt)["steps"] == tr.steps


def test_checkpoint_atomic_and_async(tmp_path):
    """Async checkpoint write lands atomically (no .tmp left, loadable),
    and wait_pending() is a reliable barrier."""
    from crank_tpu.train.checkpoint import (
        find_latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
        wait_pending,
    )

    state = {
        "steps": 7,
        "params": {"G": {"w": np.ones((64, 64), np.float32)}},
        "ema": {"c": np.zeros(3)},
        "opt": {"G": np.arange(4)},
        "rng": np.array([0, 1], np.uint32),
        "sched_anchors": {"G": {"step_offset": 0, "gap_at": 6,
                                "gap_len": 3}},
    }
    p = save_checkpoint(tmp_path, state, async_write=True)
    wait_pending()
    assert p.exists() and not list(tmp_path.glob("*.tmp"))
    payload = load_checkpoint(p)
    assert payload["steps"] == 7
    assert payload["sched_anchors"] == state["sched_anchors"]
    np.testing.assert_array_equal(
        payload["params"]["G"]["w"], state["params"]["G"]["w"]
    )
    # second (sync) save coexists; latest selection picks the higher step
    state["steps"] = 12
    save_checkpoint(tmp_path, state)
    assert find_latest_checkpoint(tmp_path).name == "checkpoint_12steps.pkl"


def test_checkpoint_orbax_roundtrip(tmp_path):
    """checkpoint_format: orbax — tensorstore/OCDBT directory checkpoints
    for elastic pod runs: exact round trip INCLUDING the optax namedtuple
    optimizer state (a target-less orbax restore would flatten those to
    dicts; the stored treedef rebuilds them), shared auto-latest
    discovery with the pickle format, async writer path."""
    import optax

    from crank_tpu.train.checkpoint import (
        find_latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
        wait_pending,
    )

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    p0 = {"w": np.ones((8, 4), np.float32), "b": np.zeros(4, np.float32)}
    opt_state = tx.init(p0)
    # advance once so counts/moments are nonzero
    g = jax.tree_util.tree_map(lambda x: jnp.asarray(x) * 0 + 0.5, p0)
    _, opt_state = tx.update(g, opt_state, p0)

    state = {
        "steps": 9,
        "params": {"G": p0},
        "ema": {"codebook": np.arange(12.0).reshape(3, 4)},
        "opt": {"G": jax.device_get(opt_state)},
        "rng": np.array([3, 4], np.uint32),
        "sched_anchors": {"D": {"step_offset": 101, "gap_at": None,
                                "gap_len": 0}},
    }
    p = save_checkpoint(tmp_path, state, async_write=True, fmt="orbax")
    wait_pending()
    assert p.is_dir() and p.name == "checkpoint_9steps.orbax"

    back = load_checkpoint(p)
    assert back["steps"] == 9
    assert back["sched_anchors"] == state["sched_anchors"]
    assert np.asarray(back["rng"]).dtype == np.uint32
    chex = jax.tree_util.tree_structure(back["opt"]["G"])
    assert chex == jax.tree_util.tree_structure(state["opt"]["G"])
    for a, b in zip(jax.tree_util.tree_leaves(back["opt"]["G"]),
                    jax.tree_util.tree_leaves(state["opt"]["G"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(back["ema"]["codebook"],
                                  state["ema"]["codebook"])
    # the restored optax state is directly usable
    _, _ = tx.update(g, jax.tree_util.tree_map(jnp.asarray, back["opt"]["G"]),
                     back["params"]["G"])

    # mixed-format latest discovery: orbax dir at a higher step wins
    state["steps"] = 4
    save_checkpoint(tmp_path, state)  # pickle at step 4
    assert find_latest_checkpoint(tmp_path).name == "checkpoint_9steps.orbax"
    state["steps"] = 15
    save_checkpoint(tmp_path, state)
    assert find_latest_checkpoint(tmp_path).name == "checkpoint_15steps.pkl"


def test_trainer_orbax_checkpoint_resume(tmp_path, corpus):
    """A trainer run with checkpoint_format: orbax writes directory
    checkpoints, and a second run resumes from them bit-exactly at
    step + 1 (same lifecycle as the pickle path)."""
    conf = make_conf(n_steps=3, dev_steps=100, n_steps_save_model=2,
                     checkpoint_format="orbax")
    models = build_models(conf, spkr_size=len(SPKRS))
    params, ema = init_models(models, conf, len(SPKRS),
                              jax.random.PRNGKey(0), B=2, T=BATCH_LEN)
    opts = make_optimizers(conf, list(models.keys()))
    state = {"params": params, "ema": ema,
             "opt": {m: opts[m].init(params[m]) for m in models}}
    loaders = get_dataloaders(conf, corpus["scp"], corpus["scaler"],
                              flag="train")
    tr = Trainer(models, opts, conf, loaders, corpus["scaler"],
                 expdir=tmp_path, init_state=state, mesh=get_mesh())
    tr.run("train")
    from crank_tpu.train.checkpoint import (
        find_latest_checkpoint, load_checkpoint,
    )

    latest = find_latest_checkpoint(tmp_path)
    assert latest.is_dir() and latest.suffix == ".orbax"
    payload = load_checkpoint(latest)
    assert payload["steps"] == conf["n_steps"]

    tr2 = Trainer(models, opts, conf, loaders, corpus["scaler"],
                  expdir=tmp_path, resume=payload["steps"],
                  rng_key=payload["rng"],
                  init_state={"params": payload["params"],
                              "ema": payload["ema"],
                              "opt": payload["opt"]},
                  mesh=get_mesh())
    assert tr2.steps == payload["steps"] + 1


def test_trainer_final_checkpoint_and_resume(tmp_path, corpus):
    """Off-cadence n_steps still writes a final checkpoint; resume
    continues at checkpoint step + 1 (no double-applied update)."""
    conf = make_conf(n_steps=5, dev_steps=100, n_steps_save_model=3)
    models = build_models(conf, spkr_size=len(SPKRS))
    params, ema = init_models(models, conf, len(SPKRS),
                              jax.random.PRNGKey(0), B=2, T=BATCH_LEN)
    opts = make_optimizers(conf, list(models.keys()))
    state = {"params": params, "ema": ema,
             "opt": {m: opts[m].init(params[m]) for m in models}}
    loaders = get_dataloaders(conf, corpus["scp"], corpus["scaler"],
                              flag="train")
    tr = Trainer(models, opts, conf, loaders, corpus["scaler"],
                 expdir=tmp_path, init_state=state, mesh=get_mesh())
    tr.run("train")
    names = sorted(p.name for p in tmp_path.glob("checkpoint_*steps.pkl"))
    # cadence saves at 3 plus the final off-cadence save at n_steps
    assert "checkpoint_3steps.pkl" in names
    assert "checkpoint_5steps.pkl" in names

    payload = load_checkpoint(tmp_path / "checkpoint_3steps.pkl")
    state2 = {k: payload[k] for k in ("params", "ema", "opt")}
    loaders2 = get_dataloaders(conf, corpus["scp"], corpus["scaler"],
                               flag="train")
    tr2 = Trainer(models, opts, conf, loaders2, corpus["scaler"],
                  expdir=tmp_path / "resumed", init_state=state2,
                  mesh=get_mesh(), resume=payload["steps"],
                  rng_key=payload["rng"])
    assert tr2.steps == 4  # checkpoint step already executed
    tr2.run("train")
    assert tr2.steps == conf["n_steps"] + 1
    assert (tmp_path / "resumed" / "checkpoint_5steps.pkl").exists()


def test_d_decay_clock_global_step_parity():
    """VERDICT r2 weak #5: the reference steps every StepLR once per
    *global* step (basetrainer), so D's LR at global step s is
    lr * decay^(s // step_size) even though D only starts updating at
    n_steps_gan_start.  The optax schedule must be offset accordingly
    whenever decay_step_size < n_steps_gan_start."""
    from crank_tpu.train.optim import _schedule, step_offsets

    gan_start, dss, decay, lr = 10, 4, 0.5, 1e-3
    conf = {"trainer_type": "lsgan", "n_steps_gan_start": gan_start}
    offs = step_offsets(conf, ["G", "D", "C", "SPKRADV"])
    # D's first update executes at global step gan_start + 1 (gan_flag
    # flips on the post-increment check, trainer._mode)
    assert offs == {"G": 0, "D": gan_start + 1, "C": 0, "SPKRADV": 0}
    # vqvae trainer has no GAN phase: no offset even if the key exists
    vq_offs = step_offsets(
        {"trainer_type": "vqvae", "n_steps_gan_start": gan_start},
        ["G", "D"],
    )
    assert vq_offs["D"] == 0

    sched = _schedule(lr, dss, decay, offs["D"])
    # reference StepLR clock: at D's c-th update the global step is
    # gan_start + 1 + c, and the update sees the LR after that many
    # scheduler.step() calls
    for c in range(0, 25):
        s = gan_start + 1 + c
        ref_lr = lr * decay ** (s // dss)
        assert abs(float(sched(c)) - ref_lr) < 1e-12, (c, s)
    # G keeps the unshifted clock
    g_sched = _schedule(lr, dss, decay, 0)
    for s in range(0, 25):
        assert abs(float(g_sched(s)) - lr * decay ** (s // dss)) < 1e-12
