"""Multi-host (multi-process) training path.

The reference's only "cluster" story is process-level job dispatch
(utils/slurm.pl etc., SURVEY.md §2.5); this framework does real gradient-
parallel multi-host training. Covered here:

* process-sharded loaders: global jit geometry, per-process local rows,
  disjoint deterministic eval slices, equalized batch counts
* a REAL 2-process ``jax.distributed`` run (CPU, 2 virtual devices per
  process = 4 global): global batch assembly from per-process shards via the
  wire codec, one vqvae train step, parameters verified identical across
  processes afterwards, then the pod-run orbax checkpoint protocol
  (process-0-gated non-collective save, restore on every process) without
  deadlock and with bit-exact round-trip.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def test_process_sharded_loaders():
    from crank_tpu.train.dataset import shard_dataset_for_process

    class _FakeDs:
        pass

    # direct slicing behavior incl. equalization
    ds = _FakeDs()
    ds.h5list = [f"u{i}" for i in range(7)]
    ds._labels = [(f"u{i}", "S") for i in range(7)]
    a = _FakeDs()
    a.h5list, a._labels = ds.h5list[:], ds._labels[:]
    b = _FakeDs()
    b.h5list, b._labels = ds.h5list[:], ds._labels[:]
    shard_dataset_for_process(a, 0, 2)
    shard_dataset_for_process(b, 1, 2)
    assert len(a.h5list) == len(b.h5list) == 4  # equalized (last repeated)
    covered = set(a.h5list) | set(b.h5list)
    assert covered == {f"u{i}" for i in range(7)}
    assert set(a.h5list[:4]).isdisjoint(set(b.h5list[:3]))


def test_get_dataloaders_process_split(tmp_path):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "tt", REPO / "tests" / "test_train.py")
    tt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tt)

    from crank_tpu.train.dataset import get_dataloaders

    conf = tt.make_conf()
    corpus = None
    # reuse the module fixture logic manually
    import tempfile

    class _F:
        def mktemp(self, name):
            return Path(tempfile.mkdtemp(prefix=name))

    corpus = tt.corpus.__wrapped__(_F())
    loaders = []
    for pi in (0, 1):
        loaders.append(get_dataloaders(
            conf, corpus["scp"], corpus["scaler"], flag="eval",
            process_index=pi, process_count=2,
        ))
    # batch_size is the GLOBAL jit geometry (recomputed for full-utterance
    # eval); each process yields local_batch_size = global / n_process rows
    assert loaders[0]["batch_size"] == loaders[1]["batch_size"]
    assert loaders[0]["local_batch_size"] == loaders[0]["batch_size"] // 2
    # disjoint eval coverage across processes, identical batch counts
    uids = []
    for ld in loaders:
        ds = ld["eval"].dataset
        uids.append({lbl for lbl, _ in ds._labels})
    n_eval = 3  # one eval utt per speaker in the fixture corpus
    assert len(uids[0] | uids[1]) == n_eval
    assert len(loaders[0]["eval"]) == len(loaders[1]["eval"])


_WORKER = textwrap.dedent("""
    import json, os, sys
    pid, port, repo = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.join(repo, "tests"))
    import jax
    # a sitecustomize hook may have imported jax already and captured an
    # accelerator platform; force the CPU backend through the live config
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4  # global
    import numpy as np
    import jax.numpy as jnp
    from test_train import make_conf, SPKRS
    from crank_tpu.parallel.mesh import (
        get_mesh, replicate, shard_batch, encode_wire, decode_wire,
        fetch_replicated, local_rows)
    from crank_tpu.train.factory import build_models, init_models
    from crank_tpu.train.optim import make_optimizers
    from crank_tpu.train.steps import Mode, StepFactory

    B_LOCAL, T, D, S = 2, 32, 16, 3
    conf = make_conf()
    models = build_models(conf, spkr_size=S)
    params, ema = init_models(models, conf, S, jax.random.PRNGKey(0),
                              B=2, T=T)
    opts = make_optimizers(conf, list(models.keys()))
    opt_state = {m: opts[m].init(params[m]) for m in models}
    factory = StepFactory(conf, models, opts, spkr_size=S)
    mesh = get_mesh()
    state = {"params": replicate(params, mesh), "ema": replicate(ema, mesh),
             "opt": replicate(opt_state, mesh)}

    rng = np.random.default_rng(100 + pid)  # DIFFERENT data per process
    valid = np.ones((B_LOCAL, T, 1), np.float32)
    org = np.full((B_LOCAL, T), pid, np.int64)
    cv = np.full((B_LOCAL, T), (pid + 1) % S, np.int64)
    eye = np.eye(S, dtype=np.float32)
    batch = {
        "in_feats": rng.standard_normal((B_LOCAL, T, D)).astype(np.float32),
        "lcf0": rng.standard_normal((B_LOCAL, T, 1)).astype(np.float32),
        "uv": (rng.random((B_LOCAL, T, 1)) > 0.3).astype(np.float32),
        "cv_lcf0": rng.standard_normal((B_LOCAL, T, 1)).astype(np.float32),
        "org_h": org, "cv_h": cv,
        "org_h_onehot": eye[org], "cv_h_onehot": eye[cv],
        "encoder_mask": valid, "decoder_mask": valid,
        "cycle_encoder_mask": valid, "cycle_decoder_mask": valid,
    }
    batch["out_feats"] = batch["in_feats"]
    dev = decode_wire(shard_batch(encode_wire(batch, np.float16), mesh))
    # global batch sanity: mean over the GLOBAL array equals the mean of
    # both processes' halves
    gmean = fetch_replicated(jnp.mean(dev["in_feats"]))

    mode = Mode(trainer_type="vqvae", gan_flag=False, cycle_flag=False,
                stop_generator=False, do_update=True)
    step = factory.make_step(mode)
    state, loss = step(state, dev, jax.random.PRNGKey(1))
    loss = fetch_replicated(loss)
    checksum = float(sum(
        np.abs(x).sum() for x in
        jax.tree_util.tree_leaves(fetch_replicated(state["params"]))))
    # local_rows returns exactly this process's rows
    lr = local_rows(dev["in_feats"])
    assert lr.shape[0] == B_LOCAL

    # --- orbax checkpoint under multi-process (VERDICT r3 #8): the
    # trainer's pod-run protocol is save on process 0 ONLY (the orbax
    # writer restricts its sync domain to that process so the save is not
    # a collective, checkpoint.py:_write_orbax), then every process
    # restores the checkpoint on relaunch.  Exercise exactly that and
    # prove no barrier deadlock + bit-exact restore on both processes.
    from jax.experimental import multihost_utils
    from crank_tpu.train.checkpoint import (
        find_latest_checkpoint, load_checkpoint, save_checkpoint)

    expdir = os.path.join(sys.argv[4], "ckpt")
    host_state = {
        "steps": 7,
        "params": fetch_replicated(state["params"]),
        "ema": fetch_replicated(state["ema"]),
        "opt": fetch_replicated(state["opt"]),
        "rng": jax.random.PRNGKey(7),
    }
    if pid == 0:
        save_checkpoint(expdir, host_state, fmt="orbax")
    multihost_utils.sync_global_devices("ckpt_written")
    latest = find_latest_checkpoint(expdir)
    assert latest is not None and latest.suffix == ".orbax", latest
    restored = load_checkpoint(latest)
    assert restored["steps"] == 7
    for live, back in ((host_state["params"], restored["params"]),
                       (host_state["ema"], restored["ema"]),
                       (host_state["opt"], restored["opt"])):
        la = jax.tree_util.tree_leaves(live)
        ba = jax.tree_util.tree_leaves(back)
        assert len(la) == len(ba)
        for x, y in zip(la, ba):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    multihost_utils.sync_global_devices("ckpt_restored")

    print("RESULT " + json.dumps({
        "pid": pid, "gmean": float(gmean), "checksum": checksum,
        "G_loss": float(loss["G"]),
        "local_ok": bool(np.allclose(lr, batch["in_feats"], atol=2e-3)),
        "orbax_ok": True,
    }))
""")


@pytest.mark.slow
def test_two_process_distributed_step(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS",
                        "CRANK_TPU_PLATFORM", "CRANK_TPU_CPU_DEVICES")}
    # drop sitecustomize dirs (e.g. a TPU-tunnel hook) that would register an
    # accelerator platform and its own distributed runtime in the workers
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "site" not in p
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port), str(REPO),
             str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, out[-4000:]
    results = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        r = json.loads(line[len("RESULT "):])
        results[r["pid"]] = r

    # replicated state identical across processes after the collective step
    assert results[0]["checksum"] == pytest.approx(
        results[1]["checksum"], rel=1e-6)
    # both saw the same GLOBAL batch statistics (assembled from local shards)
    assert results[0]["gmean"] == pytest.approx(results[1]["gmean"], rel=1e-5)
    assert np.isfinite(results[0]["G_loss"])
    assert results[0]["local_ok"] and results[1]["local_ok"]
    # orbax save (process 0 only) + restore (both) completed, no deadlock
    assert results[0]["orbax_ok"] and results[1]["orbax_ok"]
