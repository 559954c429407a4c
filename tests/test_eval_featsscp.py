"""Eval-time feats.scp override (run.sh stage 5 `--featsscp` path: decode a
different feature set, e.g. vocoder-finetuned dumps, with a trained model)."""

import subprocess
import sys
from pathlib import Path

import h5py
import numpy as np
import pytest
import yaml

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_eval_featsscp_override(tmp_path):
    """Build a tiny corpus + 1-step checkpoint, then eval with --featsscp
    pointing at an alternative feature list; outputs must decode the
    alternative utterances."""
    from crank_tpu.features.scaler import StandardScaler, save_scaler
    from crank_tpu.features.store import write_features
    from crank_tpu.utils.scp import write_scp

    rng = np.random.default_rng(0)
    dim, spkrs = 16, ["SF1", "SM1", "TF2"]
    conf = {
        "feature": {
            "label": "mlfb", "fs": 22050, "fftl": 256, "win_length": 256,
            "hop_size": 64, "window_types": ["hann"], "fmin": 80,
            "fmax": 7600, "mlfb_dim": dim, "n_iteration": 2, "framems": 20,
            "shiftms": 5.80499, "mcep_dim": 10, "mcep_alpha": 0.466,
        },
        "n_steps": 1, "dev_steps": 1000, "n_steps_save_model": 1,
        "n_steps_print_loss": 1000, "batch_size": 8, "batch_len": 32,
        "input_size": dim, "output_size": dim,
        "n_vq_stacks": 2, "n_layers": [1, 1, 1],
        "n_layers_stacks": [2, 2, 2], "kernel_size": [3, 3, 3],
        "emb_dim": [8, 8, 8], "emb_size": [16, 16, 16],
        "spkr_embedding_size": 8, "n_spkradv_layers": 2,
        "n_spkr_classifier_layers": 2,
    }
    default = yaml.safe_load(open(REPO / "egs/vaevc/template/conf/default.yml"))
    default.update(conf)
    default["feature"] = conf["feature"]
    default["stft_params"] = {"fft_sizes": [16], "win_sizes": [16],
                              "hop_sizes": [8], "logratio": 0}
    confdir = tmp_path / "conf"
    confdir.mkdir()
    yaml.safe_dump(default, open(confdir / "tiny.yml", "w"))

    featdir = tmp_path / "feature" / "mlfb"
    scaler = {"mlfb": StandardScaler(), "lcf0": StandardScaler()}
    for s in spkrs:
        scaler[s] = {"lcf0": StandardScaler()}
    alt_feats = {}
    for phase in ("train", "dev", "eval"):
        lines = {}
        for spkr in spkrs:
            wavfs = []
            for i in range(3):
                T = int(rng.integers(40, 70))
                h5f = featdir / phase / spkr / f"{30000 + i}.h5"
                write_features(h5f, {
                    "mlfb": rng.standard_normal((T, dim)).astype(np.float32),
                    "lcf0": (5 + 0.1 * rng.standard_normal((T, 1))).astype(
                        np.float32),
                    "uv": np.ones((T, 1), np.float32),
                })
                scaler["mlfb"].partial_fit(rng.standard_normal((9, dim)))
                scaler["lcf0"].partial_fit(5 + rng.standard_normal((9, 1)))
                scaler[spkr]["lcf0"].partial_fit(
                    5 + rng.standard_normal((9, 1)))
                lines[f"{spkr}_{30000 + i}"] = str(h5f)
                wavfs.append(f"/fake/{spkr}/{30000 + i}.wav")
            write_scp(tmp_path / "scp" / phase, spkr, wavfs)
        (featdir / phase).mkdir(parents=True, exist_ok=True)
        with open(featdir / phase / "feats.scp", "w") as fp:
            for uid, f in lines.items():
                fp.write(f"{uid} {f}\n")
    save_scaler(scaler, featdir / "scaler.pkl")

    # alternative eval list: only SF1's utterances, renamed dir
    altdir = featdir / "alt" / "SF1"
    with open(featdir / "alt_feats.scp", "w") as fp:
        for i in range(2):
            T = 50
            h5f = altdir / f"{40000 + i}.h5"
            write_features(h5f, {
                "mlfb": rng.standard_normal((T, dim)).astype(np.float32),
                "lcf0": (5 + 0.1 * rng.standard_normal((T, 1))).astype(
                    np.float32),
                "uv": np.ones((T, 1), np.float32),
            })
            fp.write(f"SF1_{40000 + i} {h5f}\n")

    def run(flag, extra=()):
        res = subprocess.run(
            [sys.executable, "-m", "crank_tpu.bin.train", "--flag", flag,
             "--n_jobs", "1", "--conf", confdir / "tiny.yml",
             "--checkpoint", "None", "--scpdir", tmp_path / "scp",
             "--featdir", tmp_path / "feature", "--expdir", tmp_path / "exp",
             *extra],
            capture_output=True, text=True, cwd=REPO, timeout=900,
        )
        assert res.returncode == 0, res.stdout[-2500:] + res.stderr[-2500:]

    run("train")
    run("eval", ("--featsscp", str(featdir / "alt_feats.scp")))
    out = list((tmp_path / "exp/tiny/eval_wav").rglob("*.h5"))
    stems = {p.stem.split("_org-")[0] for p in out}
    assert stems == {"40000", "40001"}  # decoded the override list
    with h5py.File(out[0], "r") as fp:
        assert "feats" in fp
