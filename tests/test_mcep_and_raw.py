"""Coverage for the mcep (WORLD) feature path and raw-waveform training.

These are BASELINE.json configs 5 (mcep feat_type + WORLD synthesis) and the
use_raw/use_sinc_conv variants.
"""

import jax
import numpy as np
import pytest

from crank_tpu.features.scaler import StandardScaler
from crank_tpu.features.store import write_features
from crank_tpu.train.dataset import VCDataset, collate, select_device_batch
from crank_tpu.train.factory import build_models, init_models
from crank_tpu.train.optim import make_optimizers
from crank_tpu.train.steps import Mode, StepFactory

from tests.test_train import make_conf

SPKRS = ["SF1", "SM1", "TF2"]
BATCH_LEN = 32
BATCH_SIZE = 8
MCEP_DIM = 10  # conf feature mcep_dim; network sees mcep_dim (1..dim) dims


@pytest.fixture(scope="module")
def mcep_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("mcep_corpus")
    rng = np.random.default_rng(3)
    scaler = {"mlfb": StandardScaler(), "lcf0": StandardScaler(),
              "mcep": StandardScaler()}
    for s in SPKRS:
        scaler[s] = {"lcf0": StandardScaler()}
    feats = {}
    for spkr in SPKRS:
        for i in range(4):
            T = int(rng.integers(40, 80))
            mcep = rng.standard_normal((T, MCEP_DIM + 1)).astype(np.float32)
            lcf0 = (5.0 + 0.1 * rng.standard_normal((T, 1))).astype(np.float32)
            uv = (rng.random((T, 1)) > 0.2).astype(np.float32)
            cap = rng.standard_normal((T, 2)).astype(np.float32)
            h5f = root / spkr / f"{spkr}_{i:02d}.h5"
            write_features(h5f, {"mcep": mcep, "lcf0": lcf0, "uv": uv,
                                 "cap": cap})
            scaler["mcep"].partial_fit(mcep)
            scaler["lcf0"].partial_fit(lcf0)
            scaler[spkr]["lcf0"].partial_fit(lcf0)
            feats[f"{spkr}_{i:02d}"] = str(h5f)
    scp = {p: {"feats": feats, "spkrs": SPKRS} for p in
           ("train", "dev", "eval")}
    return {"scp": scp, "scaler": scaler}


def test_mcep_training_step(mcep_corpus):
    conf = make_conf(
        input_feat_type="mcep", output_feat_type="mcep",
        input_size=MCEP_DIM, output_size=MCEP_DIM, use_mcep_0th=False,
        ignore_scaler=["raw", "mcep"],
    )
    ds = VCDataset(conf, mcep_corpus["scp"], mcep_corpus["scaler"],
                   phase="train", seed=0)
    sample = ds[0]
    # 0th coefficient split off, network sees mcep_dim dims
    assert sample["in_feats"].shape == (BATCH_LEN, MCEP_DIM)
    assert sample["mcep_0th"].shape == (BATCH_LEN, 1)
    assert sample["cap"].shape == (BATCH_LEN, 2)
    batch = select_device_batch(
        collate([ds[i % len(ds)] for i in range(BATCH_SIZE)])
    )
    models = build_models(conf, spkr_size=len(SPKRS))
    params, ema = init_models(models, conf, len(SPKRS),
                              jax.random.PRNGKey(0), B=2, T=BATCH_LEN)
    opts = make_optimizers(conf, list(models.keys()))
    factory = StepFactory(conf, models, opts, spkr_size=len(SPKRS))
    state = {"params": params, "ema": ema,
             "opt": {m: opts[m].init(params[m]) for m in models}}
    step = factory.make_step(Mode(trainer_type="vqvae"))
    state, loss = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(jax.device_get(loss)["G"]))


def test_raw_training_step(tmp_path):
    """use_raw=True: the G input is the frame-aligned raw crop and the
    differentiable log-mel frontend runs inside the train step."""
    fftl, hop, dim = 256, 64, 16
    conf = make_conf(use_raw=True)
    rng = np.random.default_rng(0)
    scaler = {"mlfb": StandardScaler(), "lcf0": StandardScaler()}
    for s in SPKRS:
        scaler[s] = {"lcf0": StandardScaler()}
    feats = {}
    for spkr in SPKRS:
        for i in range(3):
            T = int(rng.integers(40, 80))
            raw = (0.1 * rng.standard_normal(T * hop + fftl)).astype(
                np.float32
            )
            mlfb = rng.standard_normal((T, dim)).astype(np.float32)
            lcf0 = (5.0 + 0.1 * rng.standard_normal((T, 1))).astype(np.float32)
            uv = np.ones((T, 1), np.float32)
            h5f = tmp_path / spkr / f"{spkr}_{i}.h5"
            write_features(h5f, {"raw": raw, "mlfb": mlfb, "lcf0": lcf0,
                                 "uv": uv})
            scaler["mlfb"].partial_fit(mlfb)
            scaler["lcf0"].partial_fit(lcf0)
            scaler[spkr]["lcf0"].partial_fit(lcf0)
            feats[f"{spkr}_{i}"] = str(h5f)
    scp = {p: {"feats": feats, "spkrs": SPKRS} for p in
           ("train", "dev", "eval")}
    ds = VCDataset(conf, scp, scaler, phase="train", seed=0)
    sample = ds[0]
    assert sample["raw"].shape == (fftl + hop * BATCH_LEN - 1,)
    batch = select_device_batch(
        collate([ds[i % len(ds)] for i in range(BATCH_SIZE)])
    )
    assert "raw" in batch
    models = build_models(conf, spkr_size=len(SPKRS))
    params, ema = init_models(models, conf, len(SPKRS),
                              jax.random.PRNGKey(0), B=2, T=BATCH_LEN)
    opts = make_optimizers(conf, list(models.keys()))
    factory = StepFactory(conf, models, opts, spkr_size=len(SPKRS))
    state = {"params": params, "ema": ema,
             "opt": {m: opts[m].init(params[m]) for m in models}}
    step = factory.make_step(Mode(trainer_type="vqvae"))
    state, loss = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(jax.device_get(loss)["G"]))


def test_causal_training_step(mcep_corpus):
    """causal=True exercises the +/- causal loss trimming and the
    receptive-field trimming of the speaker-adversarial loss."""
    conf = make_conf(causal=True, causal_size=2)
    ds = VCDataset(conf, mcep_corpus["scp"], mcep_corpus["scaler"],
                   phase="train", seed=0)
    # mcep corpus features work for mlfb-typed conf? use mcep conf instead
    conf = make_conf(
        causal=True, causal_size=2,
        input_feat_type="mcep", output_feat_type="mcep",
        input_size=MCEP_DIM, output_size=MCEP_DIM,
    )
    ds = VCDataset(conf, mcep_corpus["scp"], mcep_corpus["scaler"],
                   phase="train", seed=0)
    batch = select_device_batch(
        collate([ds[i % len(ds)] for i in range(BATCH_SIZE)])
    )
    models = build_models(conf, spkr_size=len(SPKRS))
    assert models["G"].encoder_receptive_size > 0
    params, ema = init_models(models, conf, len(SPKRS),
                              jax.random.PRNGKey(0), B=2, T=BATCH_LEN)
    opts = make_optimizers(conf, list(models.keys()))
    factory = StepFactory(conf, models, opts, spkr_size=len(SPKRS))
    assert factory.er > 0
    state = {"params": params, "ema": ema,
             "opt": {m: opts[m].init(params[m]) for m in models}}
    step = factory.make_step(Mode(trainer_type="vqvae"))
    state, loss = step(state, batch, jax.random.PRNGKey(1))
    loss = jax.device_get(loss)
    assert np.isfinite(float(loss["G"]))
    assert np.isfinite(float(loss["SPKRADV"]))
    # negative causal_size trim direction too
    conf2 = make_conf(
        causal=True, causal_size=-2,
        input_feat_type="mcep", output_feat_type="mcep",
        input_size=MCEP_DIM, output_size=MCEP_DIM,
    )
    factory2 = StepFactory(conf2, models, opts, spkr_size=len(SPKRS))
    step2 = factory2.make_step(Mode(trainer_type="vqvae"))
    _, loss2 = step2(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(jax.device_get(loss2)["G"]))


def test_sinc_conv_training_step(tmp_path):
    """use_sinc_conv=True: learnable band-pass frontend feeding the VQ-VAE,
    frame-aligned to the raw-crop convention."""
    fftl, hop, dim = 256, 64, 16
    conf = make_conf(use_sinc_conv=True)
    conf["sinc_conv_down_sample_kernel_sizes"] = [4, 4, 4]  # prod == hop
    conf["sinc_conv_channels"] = 8
    rng = np.random.default_rng(0)
    scaler = {"mlfb": StandardScaler(), "lcf0": StandardScaler()}
    for s in SPKRS:
        scaler[s] = {"lcf0": StandardScaler()}
    feats = {}
    for spkr in SPKRS:
        for i in range(3):
            T = int(rng.integers(40, 80))
            raw = (0.1 * rng.standard_normal(T * hop + fftl)).astype(np.float32)
            mlfb = rng.standard_normal((T, dim)).astype(np.float32)
            lcf0 = (5.0 + 0.1 * rng.standard_normal((T, 1))).astype(np.float32)
            h5f = tmp_path / spkr / f"{spkr}_{i}.h5"
            write_features(h5f, {"raw": raw, "mlfb": mlfb, "lcf0": lcf0,
                                 "uv": np.ones((T, 1), np.float32)})
            scaler["mlfb"].partial_fit(mlfb)
            scaler["lcf0"].partial_fit(lcf0)
            scaler[spkr]["lcf0"].partial_fit(lcf0)
            feats[f"{spkr}_{i}"] = str(h5f)
    scp = {p: {"feats": feats, "spkrs": SPKRS} for p in
           ("train", "dev", "eval")}
    ds = VCDataset(conf, scp, scaler, phase="train", seed=0)
    batch = select_device_batch(
        collate([ds[i % len(ds)] for i in range(BATCH_SIZE)])
    )
    models = build_models(conf, spkr_size=len(SPKRS))
    params, ema = init_models(models, conf, len(SPKRS),
                              jax.random.PRNGKey(0), B=2, T=BATCH_LEN)
    opts = make_optimizers(conf, list(models.keys()))
    factory = StepFactory(conf, models, opts, spkr_size=len(SPKRS))
    state = {"params": params, "ema": ema,
             "opt": {m: opts[m].init(params[m]) for m in models}}
    step = factory.make_step(Mode(trainer_type="vqvae"))
    # snapshot before the step: state buffers are donated to the jit
    f0 = np.array(jax.device_get(params["G"])["preprocess"]["SincConv_0"]["f"])
    state, loss = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(jax.device_get(loss)["G"]))
    # sinc filter params received gradient
    f1 = jax.device_get(state["params"]["G"])["preprocess"]["SincConv_0"]["f"]
    assert not np.allclose(f0, f1)


def test_vectorized_loader_raw_equivalence(tmp_path):
    """The bank-gather loader's raw crops reproduce padding_raw bit-for-bit
    for both branches (p>0 offset crop; p==0 / short-utterance reflect pad).
    Round-1 gap: use_raw fell back to the slow per-item loader."""
    from crank_tpu.train.dataset import VectorizedLoader, padding_raw

    fftl, hop, dim = 256, 64, 16
    conf = make_conf(use_raw=True)
    rng = np.random.default_rng(3)
    scaler = {"mlfb": StandardScaler(), "lcf0": StandardScaler()}
    for s in SPKRS:
        scaler[s] = {"lcf0": StandardScaler()}
    feats = {}
    raws = {}
    # mix of long (crop) and short (pad) utterances
    lengths = [BATCH_LEN * 3, BATCH_LEN // 2, BATCH_LEN * 2, 20, 70, 90]
    for spkr in SPKRS:
        for i in range(2):
            T = lengths[(SPKRS.index(spkr) * 2 + i) % len(lengths)]
            raw = (0.1 * rng.standard_normal(T * hop + fftl)).astype(
                np.float32)
            mlfb = rng.standard_normal((T, dim)).astype(np.float32)
            lcf0 = (5.0 + 0.1 * rng.standard_normal((T, 1))).astype(
                np.float32)
            uv = np.ones((T, 1), np.float32)
            h5f = tmp_path / spkr / f"{spkr}_{i}.h5"
            write_features(h5f, {"raw": raw, "mlfb": mlfb, "lcf0": lcf0,
                                 "uv": uv})
            scaler["mlfb"].partial_fit(mlfb)
            scaler["lcf0"].partial_fit(lcf0)
            scaler[spkr]["lcf0"].partial_fit(lcf0)
            feats[f"{spkr}_{i}"] = str(h5f)
            raws[f"{spkr}_{i}"] = raw
    scp = {p: {"feats": feats, "spkrs": SPKRS} for p in
           ("train", "dev", "eval")}
    ds = VCDataset(conf, scp, scaler, phase="train", seed=0)
    loader = VectorizedLoader(ds, batch_size=len(feats), seed=0)
    batch = next(iter(loader))
    assert batch["raw"].shape == (len(feats), fftl + hop * BATCH_LEN - 1)

    # verify each row against padding_raw at the loader's chosen offsets
    flens = loader.flens
    hfftl = fftl // 2
    for row in range(batch["raw"].shape[0]):
        r = batch["raw"][row]
        i = [k for k, (lbl, _) in enumerate(ds._labels)
             if lbl == batch["flbl"][row]][0]
        x = np.asarray(raws[ds._labels[i][0].split("/")[-1]])
        if flens[i] <= BATCH_LEN:
            expect = padding_raw(x, BATCH_LEN - flens[i], BATCH_LEN, fftl,
                                 hop, p=0)
            np.testing.assert_array_equal(r, expect)
        else:
            # offset crop: zero prefix then a contiguous slice of x
            assert (r[:hfftl] == 0).all()
            seg = r[hfftl:]
            # find the offset by matching the first samples
            n = len(x)
            cand = [p for p in range(flens[i] - BATCH_LEN)
                    if np.array_equal(seg[:32], x[p * hop: p * hop + 32])]
            assert cand, "crop does not align to any hop offset"
            p = cand[0]
            expect = padding_raw(x, BATCH_LEN - flens[i], BATCH_LEN, fftl,
                                 hop, p=p)
            np.testing.assert_array_equal(r, expect)


def test_excit_training_step(mcep_corpus):
    """Working `excit` output feature type: target = [lcf0, uv, cap]
    (the reference's intent at dataset.py:111-112, broken upstream: an
    array-to-string compare guards an invalid np.hstack call, so its
    excit branch can never run)."""
    excit_dim = 1 + 1 + 2  # lcf0 + uv + cap(2 bands in this fixture)
    conf = make_conf(
        input_feat_type="mcep", output_feat_type="excit",
        input_size=MCEP_DIM, output_size=excit_dim, use_mcep_0th=False,
        ignore_scaler=["raw", "mcep"],
    )
    ds = VCDataset(conf, mcep_corpus["scp"], mcep_corpus["scaler"],
                   phase="train", seed=0)
    sample = ds[0]
    assert sample["out_feats"].shape == (BATCH_LEN, excit_dim)
    # target layout: normalized lcf0, raw uv, raw cap
    np.testing.assert_allclose(sample["out_feats"][:, :1], sample["lcf0"])
    np.testing.assert_allclose(sample["out_feats"][:, 1:2], sample["uv"])
    np.testing.assert_allclose(sample["out_feats"][:, 2:], sample["cap"])

    batch = select_device_batch(
        collate([ds[i % len(ds)] for i in range(BATCH_SIZE)])
    )
    models = build_models(conf, spkr_size=len(SPKRS))
    params, ema = init_models(models, conf, len(SPKRS),
                              jax.random.PRNGKey(0), B=2, T=BATCH_LEN)
    opts = make_optimizers(conf, list(models.keys()))
    factory = StepFactory(conf, models, opts, spkr_size=len(SPKRS))
    state = {"params": params, "ema": ema,
             "opt": {m: opts[m].init(params[m]) for m in models}}
    step = factory.make_step(Mode(trainer_type="vqvae"))
    state, loss = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(jax.device_get(loss)["G"]))


def test_excit_vectorized_loader(mcep_corpus):
    from crank_tpu.train.dataset import VectorizedLoader

    excit_dim = 4
    conf = make_conf(
        input_feat_type="mcep", output_feat_type="excit",
        input_size=MCEP_DIM, output_size=excit_dim, use_mcep_0th=False,
        ignore_scaler=["raw", "mcep"], cache_dataset=True,
    )
    ds = VCDataset(conf, mcep_corpus["scp"], mcep_corpus["scaler"],
                   phase="train", seed=0)
    loader = VectorizedLoader(ds, batch_size=BATCH_SIZE, seed=1)
    b = loader.next_batch() if hasattr(loader, "next_batch") else next(
        iter(loader)
    )
    assert b["out_feats"].shape[-1] == excit_dim
    np.testing.assert_allclose(b["out_feats"][..., :1], b["lcf0"])
    np.testing.assert_allclose(b["out_feats"][..., 1:2], b["uv"])

def test_excit_as_input_feature(mcep_corpus):
    """excit as the *input* feature type: __init__ prepared for it but
    __getitem__ previously built the excit tensor only for the output
    role, crashing with KeyError before the flen read (review finding)."""
    excit_dim = 1 + 1 + 2
    conf = make_conf(
        input_feat_type="excit", output_feat_type="mcep",
        input_size=excit_dim, output_size=MCEP_DIM, use_mcep_0th=False,
        ignore_scaler=["raw", "mcep"],
    )
    ds = VCDataset(conf, mcep_corpus["scp"], mcep_corpus["scaler"],
                   phase="train", seed=0)
    sample = ds[0]
    assert sample["in_feats"].shape == (BATCH_LEN, excit_dim)
    np.testing.assert_allclose(sample["in_feats"][:, :1], sample["lcf0"])

    from crank_tpu.train.dataset import VectorizedLoader
    conf2 = dict(conf, cache_dataset=True)
    ds2 = VCDataset(conf2, mcep_corpus["scp"], mcep_corpus["scaler"],
                    phase="train", seed=0)
    loader = VectorizedLoader(ds2, batch_size=BATCH_SIZE, seed=1)
    b = next(iter(loader))
    assert b["in_feats"].shape[-1] == excit_dim
