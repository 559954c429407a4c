"""Device-resident loader: on-device batch assembly == host vectorized loader.

The device loader consumes the same host RNG stream (epoch permutation +
VectorizedLoader._sample_plan) and moves only the gather/transform work onto
the accelerator, so its batches must equal the host loader's key-for-key.
"""

import copy

import jax
import numpy as np
import pytest

from crank_tpu.features.scaler import StandardScaler
from crank_tpu.features.store import write_features
from crank_tpu.parallel.mesh import get_mesh
from crank_tpu.train.dataset import (
    DEVICE_KEYS, VCDataset, VectorizedLoader, select_device_batch,
)
from crank_tpu.train.device_loader import (
    DeviceResidentLoader, eligible, maybe_device_loader,
)

from tests.test_train import make_conf

SPKRS = ["SF1", "SM1", "TF2"]
BATCH_LEN = 32
BATCH_SIZE = 8


def _corpus(root, with_mcep=False):
    rng = np.random.default_rng(11)
    scaler = {"mlfb": StandardScaler(), "lcf0": StandardScaler()}
    if with_mcep:
        scaler["mcep"] = StandardScaler()
    for s in SPKRS:
        scaler[s] = {"lcf0": StandardScaler()}
    feats = {}
    for spkr in SPKRS:
        for i in range(8):
            # mix of shorter- and longer-than-batch_len utterances so both
            # crop branches (random offset / zero pad) are exercised
            T = int(rng.integers(20, 70))
            data = {
                "mlfb": rng.standard_normal((T, 16)).astype(np.float32),
                "lcf0": (5.0 + 0.1 * rng.standard_normal((T, 1))).astype(
                    np.float32
                ),
                "uv": (rng.random((T, 1)) > 0.2).astype(np.float32),
            }
            if with_mcep:
                data["mcep"] = rng.standard_normal((T, 11)).astype(np.float32)
                data["cap"] = rng.standard_normal((T, 2)).astype(np.float32)
            h5f = root / spkr / f"{spkr}_{i:02d}.h5"
            write_features(h5f, data)
            for k in ("mlfb", "lcf0") + (("mcep",) if with_mcep else ()):
                scaler[k].partial_fit(data[k])
            scaler[spkr]["lcf0"].partial_fit(data["lcf0"])
            feats[f"{spkr}_{i:02d}"] = str(h5f)
    scp = {p: {"feats": feats, "spkrs": SPKRS} for p in
           ("train", "dev", "eval")}
    return scp, scaler


def _compare_streams(conf, scp, scaler, n_batches=3):
    mesh = get_mesh()
    host_ds = VCDataset(conf, scp, scaler, phase="train", seed=0)
    dev_ds = VCDataset(conf, scp, scaler, phase="train", seed=0)
    host = VectorizedLoader(host_ds, batch_size=BATCH_SIZE, seed=7)
    dev = DeviceResidentLoader(
        VectorizedLoader(dev_ds, batch_size=BATCH_SIZE, seed=7), mesh, conf
    )
    hit, dit = iter(host), iter(dev)
    for _ in range(n_batches):
        hb = select_device_batch(next(hit))
        db = next(dit)
        assert set(hb) == set(db) & set(DEVICE_KEYS)
        for k in hb:
            got = np.asarray(jax.device_get(db[k]))
            want = np.asarray(hb[k], dtype=got.dtype)
            np.testing.assert_allclose(
                got, want, rtol=0, atol=1e-6, err_msg=k
            )


def test_device_loader_matches_host_mlfb(tmp_path):
    scp, scaler = _corpus(tmp_path)
    conf = make_conf()
    _compare_streams(conf, scp, scaler)


def test_device_loader_matches_host_mcep(tmp_path):
    scp, scaler = _corpus(tmp_path, with_mcep=True)
    conf = make_conf(
        input_feat_type="mcep", output_feat_type="mcep",
        input_size=10, output_size=10, use_mcep_0th=False,
        ignore_scaler=["raw", "mcep"],
    )
    _compare_streams(conf, scp, scaler)


def test_device_loader_output_sharded_over_mesh(tmp_path):
    scp, scaler = _corpus(tmp_path)
    conf = make_conf()
    mesh = get_mesh()
    ds = VCDataset(conf, scp, scaler, phase="train", seed=0)
    dev = DeviceResidentLoader(
        VectorizedLoader(ds, batch_size=BATCH_SIZE, seed=1), mesh, conf
    )
    b = next(iter(dev))
    n_data = mesh.shape["data"]
    assert b["in_feats"].shape[0] == BATCH_SIZE
    shard_rows = {s.data.shape[0] for s in b["in_feats"].addressable_shards}
    assert shard_rows == {BATCH_SIZE // n_data}


def test_eligibility_gates(tmp_path):
    scp, scaler = _corpus(tmp_path)
    conf = make_conf()
    mesh = get_mesh()
    ds = VCDataset(conf, scp, scaler, phase="train", seed=0)
    vl = VectorizedLoader(ds, batch_size=BATCH_SIZE, seed=1)
    assert eligible(conf, vl)
    assert isinstance(maybe_device_loader(vl, mesh, conf),
                      DeviceResidentLoader)

    off = copy.deepcopy(conf)
    off["device_loader"] = False
    assert maybe_device_loader(vl, mesh, off) is vl

    aug = copy.deepcopy(conf)
    aug["spec_augment"] = True
    aug["n_spec_augment"] = 2
    assert maybe_device_loader(vl, mesh, aug) is vl
    aug["device_loader"] = True
    with pytest.raises(ValueError):
        maybe_device_loader(vl, mesh, aug)


def test_fused_step_matches_prestaged(tmp_path):
    """The production path fuses assembly INTO the train-step jit
    (trainer._fused_step); its losses must equal running the same step on
    the separately-assembled batch (same plan, same state, same rng)."""
    from crank_tpu.train.factory import build_models, init_models
    from crank_tpu.train.optim import make_optimizers
    from crank_tpu.train.steps import Mode, StepFactory
    from crank_tpu.parallel.mesh import replicate

    scp, scaler = _corpus(tmp_path)
    conf = make_conf()
    mesh = get_mesh()
    ds = VCDataset(conf, scp, scaler, phase="train", seed=0)
    dev = DeviceResidentLoader(
        VectorizedLoader(ds, batch_size=BATCH_SIZE, seed=3), mesh, conf
    )
    spkr_size = len(SPKRS)
    models = build_models(conf, spkr_size)
    params, ema = init_models(models, conf, spkr_size,
                              jax.random.PRNGKey(0), B=2, T=BATCH_LEN)
    opts = make_optimizers(conf, list(models.keys()))
    state = {"params": params, "ema": ema,
             "opt": {m: opts[m].init(params[m]) for m in models}}
    state = {k: replicate(v, mesh) for k, v in state.items()}
    state2 = jax.tree_util.tree_map(lambda x: x + 0, state)

    factory = StepFactory(conf, models, opts, spkr_size=spkr_size)
    step = factory.make_step(Mode(trainer_type="vqvae"))
    assemble = dev.assemble_fn
    plan = next(dev.iter_plans())
    key = jax.random.PRNGKey(5)

    def fused(state, banks, lcf0_raw, f0_mean, f0_std, plan, rng):
        batch = assemble(banks, lcf0_raw, f0_mean, f0_std, *plan)
        return step(state, batch, rng)

    fused = jax.jit(fused, donate_argnums=(0,))
    _, loss_f = fused(state, *dev.bank_args, plan, key)

    batch = assemble(*dev.bank_args, *plan)
    _, loss_s = step(state2, batch, key)
    for k in loss_f:
        np.testing.assert_allclose(
            np.asarray(loss_f[k]), np.asarray(loss_s[k]),
            rtol=1e-6, atol=1e-6, err_msg=k,
        )
