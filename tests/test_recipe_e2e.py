"""Full-recipe smoke test: stages 0→7 on a synthetic 3-speaker corpus.

Exercises the complete stack end-to-end through the stage runner:
scp generation → feature extraction (native vocoder) → statistics →
training (jitted steps) → conversion decoding → Griffin-Lim synthesis →
MCD + MOSnet evaluation.  The reference has no equivalent test (SURVEY.md §4).
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

from crank_tpu.utils.audio_io import write_wav

REPO = Path(__file__).resolve().parents[1]
FS = 22050


def synth_utterance(rng, base_f0, dur=0.9):
    t = np.arange(int(FS * dur)) / FS
    f0 = base_f0 * (1 + 0.08 * np.sin(2 * np.pi * rng.uniform(1, 3) * t))
    phase = 2 * np.pi * np.cumsum(f0) / FS
    x = sum(
        a * np.sin(k * phase)
        for k, a in enumerate([0.5, 0.3, 0.15, 0.08], start=1)
    )
    env = 0.4 + 0.6 * 0.5 * (1 + np.sin(2 * np.pi * 1.3 * t))
    x = x * env + 0.01 * rng.standard_normal(len(t))
    return (0.6 * x / np.abs(x).max()).astype(np.float64)


@pytest.fixture(scope="module")
def recipe(tmp_path_factory):
    root = tmp_path_factory.mktemp("recipe")
    rng = np.random.default_rng(11)
    wavdir = root / "downloads" / "wav"
    base = {"SF1": 220, "SM1": 120, "TF2": 260}
    for spkr, f0 in base.items():
        (wavdir / spkr).mkdir(parents=True)
        for i in range(5):
            write_wav(wavdir / spkr / f"{30000 + i}.wav",
                      synth_utterance(rng, f0), FS)

    confdir = root / "conf"
    confdir.mkdir()
    default = yaml.safe_load(
        open(REPO / "egs/vaevc/template/conf/default.yml")
    )
    default.update(
        n_steps=2, dev_steps=1000, n_steps_save_model=2, n_steps_print_loss=1,
        batch_size=8, batch_len=32, input_size=24, output_size=24,
        n_vq_stacks=2, n_layers=[1, 1, 1], n_layers_stacks=[2, 2, 2],
        kernel_size=[3, 3, 3], emb_dim=[8, 8, 8], emb_size=[16, 16, 16],
        spkr_embedding_size=8, n_spkradv_layers=2, n_spkr_classifier_layers=2,
    )
    default["feature"].update(
        fftl=512, win_length=512, hop_size=128, mlfb_dim=24, n_iteration=3,
        mcep_dim=19,
    )
    default["stft_params"] = {"fft_sizes": [16, 32], "win_sizes": [16, 32],
                              "hop_sizes": [8, 16], "logratio": 0}
    with open(confdir / "default.yml", "w") as fp:
        yaml.safe_dump(default, fp)
    with open(confdir / "tiny_vqvae.yml", "w") as fp:
        yaml.safe_dump({"trainer_type": "vqvae"}, fp)
    return root


def run_stages(recipe, stage, stop, extra=(), conf="conf/tiny_vqvae.yml"):
    cmd = [
        sys.executable, "-m", "crank_tpu.bin.run",
        "--recipe", str(recipe), "--conf", conf,
        "--stage", str(stage), "--stop_stage", str(stop),
        "--n_jobs", "2", "--voc", "GL",
        "--dev_utterances", "1", "--eval_utterances", "1",
        *extra,
    ]
    res = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                         timeout=1500)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    return res


@pytest.mark.slow
def test_full_recipe(recipe):
    run_stages(recipe, 0, 0)
    assert (recipe / "data/scp/train/wav.scp").exists()
    # stage 0 auto-created a default spkr.yml (generate_scp.py parity);
    # overwrite with tuned ranges (what stage 1's histograms would inform)
    with open(recipe / "conf/spkr.yml", "w") as fp:
        yaml.safe_dump(
            {s: {"minf0": lo, "maxf0": hi, "npow": -30}
             for s, (lo, hi) in
             {"SF1": (120, 380), "SM1": (70, 240), "TF2": (140, 420)}.items()},
            fp,
        )
    run_stages(recipe, 2, 2)
    featdir = recipe / "data/feature/mlfb"
    assert (featdir / "train/feats.scp").exists()
    assert (featdir / "scaler.pkl").exists()
    h5s = list((featdir / "train").rglob("*.h5"))
    assert len(h5s) == 9

    run_stages(recipe, 3, 3)
    expdir = recipe / "exp/tiny_vqvae"
    assert list(expdir.glob("checkpoint_*steps.pkl"))

    run_stages(recipe, 5, 7)
    outdir = expdir / "eval_PWG_wav" / "2"
    wavs = list((outdir / "wav").rglob("*.wav"))
    assert len(wavs) == 9  # 3 eval utts x 3 target speakers
    mcd_log = (outdir / "mcd.log").read_text().strip().splitlines()
    assert len(mcd_log) >= 6  # speaker pairs incl. self
    for line in mcd_log:
        # a 2-step model converts to near-noise; NaN (no voiced frames after
        # GL) is acceptable for the smoke test — the pipeline integrity is
        # what's under test, MCD quality is covered by eval unit tests
        val = float(line.split()[-1])
        assert np.isnan(val) or 0 < val < 500
    assert (outdir / "mosnet.log").exists()


@pytest.mark.slow
def test_array_job_fanout_matches_single_job(recipe):
    """Stages 2 and 7 with --n_parallel_jobs 2 (the utils/run.pl JOB=1:N
    role): per-job logs exist, feats.scp is complete, and the merged MCD
    summary is line-identical to the single-job run from test_full_recipe.

    Runs after test_full_recipe on the module-scoped recipe fixture."""
    expdir = recipe / "exp/tiny_vqvae"
    outdir = expdir / "eval_PWG_wav" / "2"
    single_mcd = (outdir / "mcd.log").read_text()
    assert single_mcd  # test_full_recipe ran first

    run_stages(recipe, 2, 2, extra=("--n_parallel_jobs", "2"))
    logdir = recipe / "data/log"
    for phase in ("train", "dev", "eval"):
        assert (logdir / f"extract_feature_{phase}.log.1").exists()
        assert (logdir / f"extract_feature_{phase}.log.2").exists()
    featdir = recipe / "data/feature/mlfb"
    assert len((featdir / "train/feats.scp").read_text().splitlines()) == 9
    assert len(list((featdir / "train").rglob("*.h5"))) == 9

    run_stages(recipe, 7, 7, extra=("--n_parallel_jobs", "2"))
    assert (outdir / "mcd_utt.log.1").exists()
    assert (outdir / "mcd_utt.log.2").exists()
    merged_mcd = (outdir / "mcd.log").read_text()
    assert merged_mcd == single_mcd


@pytest.mark.slow
def test_warm_start_gan_resume(recipe):
    """Resuming a vqvae-pretrain checkpoint under an lsgan conf
    fresh-initializes the missing D (train.py warm-start) and trains the
    GAN phase — the reference must run all phases in one process.

    Runs after test_full_recipe on the module-scoped recipe fixture."""
    vq_ckpts = sorted((recipe / "exp/tiny_vqvae").glob(
        "checkpoint_*steps.pkl"
    ))
    assert vq_ckpts  # test_full_recipe ran first
    with open(recipe / "conf/tiny_lsgan.yml", "w") as fp:
        yaml.safe_dump(
            {"trainer_type": "lsgan", "n_steps": 4,
             "n_steps_gan_start": 2, "n_steps_save_model": 4}, fp,
        )
    run_stages(recipe, 3, 3,
               extra=("--resume_checkpoint", str(vq_ckpts[-1])),
               conf="conf/tiny_lsgan.yml")
    expdir = recipe / "exp/tiny_lsgan"
    ck = list(expdir.glob("checkpoint_*steps.pkl"))
    assert ck, list(expdir.iterdir())
    import pickle

    with open(sorted(ck)[-1], "rb") as fp:
        payload = pickle.load(fp)
    assert "D" in payload["params"]  # fresh-initialized and trained
    assert payload["steps"] > 2


@pytest.mark.slow
def test_full_recipe_mcep(recipe):
    """mcep (WORLD path) stages 3->7: train with mcep in/out, decode h5
    dumps with cap+rmcep, stage-6 WORLD synthesis of eval wavs via
    bin/world_synthesis, stage-7 MCD straight from the decoded dumps
    (reference evaluate_mcd.py:52-57; its run.sh stage 6 runs GL on mcep
    and cannot produce these wavs).

    Reuses the module recipe's stage-2 features (the h5s carry mcep/cap
    regardless of the training conf).  Runs after test_full_recipe."""
    featdir = recipe / "data/feature/mlfb"
    assert (featdir / "scaler.pkl").exists()  # test_full_recipe ran first
    with open(recipe / "conf/tiny_mcep.yml", "w") as fp:
        yaml.safe_dump({
            "trainer_type": "vqvae", "input_feat_type": "mcep",
            "output_feat_type": "mcep", "input_size": 19, "output_size": 19,
            "use_mcep_0th": False, "ignore_scaler": ["mcep"],
        }, fp)
    run_stages(recipe, 3, 3, conf="conf/tiny_mcep.yml")
    expdir = recipe / "exp/tiny_mcep"
    assert list(expdir.glob("checkpoint_*steps.pkl"))

    run_stages(recipe, 5, 7, conf="conf/tiny_mcep.yml")
    outdir = expdir / "eval_wav" / "2"
    h5s = list(outdir.rglob("*.h5"))
    assert len(h5s) == 9
    import h5py

    with h5py.File(sorted(h5s)[0], "r") as fp:
        assert "cap" in fp and "rmcep" in fp
        assert fp["feats"].shape[1] == 20  # 0th re-attached
    wavs = list((outdir / "wav").rglob("*.wav"))
    assert len(wavs) == 9
    mcd_lines = (outdir / "mcd.log").read_text().strip().splitlines()
    assert len(mcd_lines) == 9
    for line in mcd_lines:
        val = float(line.split()[-1])
        assert np.isnan(val) or 0 < val < 500


@pytest.mark.slow
def test_full_recipe_mcep_npwg(recipe):
    """--voc NPWG on an mcep conf reaches the neural vocoder (stage-6
    routing regression: the parametric-WORLD mcep default must not shadow
    an explicit NPWG choice) and stage 7 then measures the NPWG wavs by
    WORLD re-analysis (--from_wav) instead of reading the h5 dumps.

    Reuses test_full_recipe_mcep's trained model + stage-5 dumps."""
    expdir = recipe / "exp/tiny_mcep"
    assert list(expdir.glob("checkpoint_*steps.pkl"))  # mcep test ran
    conf_path = recipe / "conf/tiny_mcep.yml"
    conf = yaml.safe_load(open(conf_path))
    # vocoder block is inert for VC training, so editing in place keeps
    # the expdir/confname (and the stage-5 dumps) of the previous test
    conf["vocoder"] = {
        "layers": 4, "stacks": 2, "residual_channels": 8,
        "gate_channels": 16, "skip_channels": 8, "batch_size": 8,
        "batch_max_frames": 24, "n_steps": 2, "n_steps_save_model": 2,
        "n_steps_print_loss": 1, "discriminator_train_start_steps": 1,
        "finetune_steps": 1,
    }
    with open(conf_path, "w") as fp:
        yaml.safe_dump(conf, fp)
    run_stages(recipe, 6, 7, conf="conf/tiny_mcep.yml",
               extra=("--voc", "NPWG"))
    # the vocoder actually trained and decoded
    assert list((recipe / "exp/vocoder").glob("checkpoint_*steps.pkl"))
    outdir = expdir / "eval_PWG_wav" / "2"
    wavs = list((outdir / "wav").rglob("*.wav"))
    assert len(wavs) == 9
    # MCD came from wav re-analysis, not the dumps
    assert "from_wav" in (outdir / "mcd_run.log").read_text()
    mcd_lines = (outdir / "mcd.log").read_text().strip().splitlines()
    assert len(mcd_lines) == 9
    for line in mcd_lines:
        val = float(line.split()[-1])
        assert np.isnan(val) or 0 < val < 500


def test_voc_routing_uses_merged_output_feat_type(tmp_path):
    """Stage-6/7 vocoder routing keys off output_feat_type AFTER the
    default.yml merge: a recipe conf that inherits its mcep-ness from
    default.yml (or converts mlfb in / mcep out) must be routed down the
    mcep path.  Regression for routing on the raw conf's input_feat_type,
    which sent inherited-mcep confs to griffin_lim and an empty mcd.log."""
    root = tmp_path / "recipe"
    (root / "conf").mkdir(parents=True)
    default = yaml.safe_load(
        open(REPO / "egs/vaevc/template/conf/default.yml")
    )
    default["input_feat_type"] = "mcep"
    default["output_feat_type"] = "mcep"
    with open(root / "conf" / "default.yml", "w") as fp:
        yaml.safe_dump(default, fp)
    # override conf inherits both feat types from default.yml
    with open(root / "conf" / "inherit.yml", "w") as fp:
        yaml.safe_dump({"trainer_type": "vqvae"}, fp)

    def run_voc(voc, conf):
        return subprocess.run(
            [sys.executable, "-m", "crank_tpu.bin.run", "--recipe",
             str(root), "--conf", conf, "--stage", "9", "--stop_stage",
             "8", "--voc", voc],
            cwd=REPO, capture_output=True, text=True, timeout=300,
        )

    # inherited mcep: --voc WORLD is valid (no stage runs; the gate alone)
    res = run_voc("WORLD", "conf/inherit.yml")
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]

    # explicit mel output: --voc WORLD must be rejected with the message
    with open(root / "conf" / "mel.yml", "w") as fp:
        yaml.safe_dump(
            {"input_feat_type": "mlfb", "output_feat_type": "mlfb"}, fp
        )
    res = run_voc("WORLD", "conf/mel.yml")
    assert res.returncode != 0
    assert "output_feat_type: mcep" in res.stdout + res.stderr


def test_stage3_refuses_silent_restart(tmp_path):
    """Re-running stage 3 over existing checkpoints must fail loudly
    instead of restarting from step 0 and overwriting the step-named
    checkpoints of an interrupted long run."""
    root = tmp_path / "recipe"
    (root / "conf").mkdir(parents=True)
    default = yaml.safe_load(
        open(REPO / "egs/vaevc/template/conf/default.yml")
    )
    with open(root / "conf" / "default.yml", "w") as fp:
        yaml.safe_dump(default, fp)
    with open(root / "conf" / "t.yml", "w") as fp:
        yaml.safe_dump({"trainer_type": "vqvae"}, fp)
    (root / "exp" / "t").mkdir(parents=True)
    (root / "exp" / "t" / "checkpoint_50steps.pkl").touch()

    def run3(extra=()):
        return subprocess.run(
            [sys.executable, "-m", "crank_tpu.bin.run", "--recipe",
             str(root), "--conf", "conf/t.yml", "--stage", "3",
             "--stop_stage", "3", *extra],
            cwd=REPO, capture_output=True, text=True, timeout=300,
        )

    res = run3()
    assert res.returncode != 0
    assert "checkpoint_50steps.pkl already exists" in res.stdout + res.stderr

    # LATEST with an empty expdir is also a loud error
    (root / "exp" / "t" / "checkpoint_50steps.pkl").unlink()
    res = run3(extra=("--resume_checkpoint", "LATEST"))
    assert res.returncode != 0
    assert "no checkpoint under" in res.stdout + res.stderr
