"""CLI-level tests for the smaller tools (scp generation, results
aggregation, rename, config merge)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import yaml

REPO = Path(__file__).resolve().parents[1]


def _run(mod, *args):
    res = subprocess.run(
        [sys.executable, "-m", f"crank_tpu.bin.{mod}", *map(str, args)],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    return res


def test_generate_scp(tmp_path):
    for spkr in ("A1", "B2", "C3"):
        d = tmp_path / "wav" / spkr
        d.mkdir(parents=True)
        for i in range(8):
            (d / f"{i:03d}.wav").write_bytes(b"RIFF")
    _run("generate_scp", "--wavdir", tmp_path / "wav",
         "--scpdir", tmp_path / "scp", "--spkr_yml", tmp_path / "spkr.yml",
         "--dev_utterances", 2, "--eval_utterances", 2,
         "--eval_speakers", "")
    spkr_yml = yaml.safe_load(open(tmp_path / "spkr.yml"))
    assert set(spkr_yml) == {"A1", "B2", "C3"}
    assert spkr_yml["A1"] == {"minf0": 40, "maxf0": 700, "npow": -20}
    train = (tmp_path / "scp/train/wav.scp").read_text().splitlines()
    dev = (tmp_path / "scp/dev/wav.scp").read_text().splitlines()
    ev = (tmp_path / "scp/eval/wav.scp").read_text().splitlines()
    assert len(train) == 3 * 4 and len(dev) == 3 * 2 and len(ev) == 3 * 2
    utt2spk = dict(
        line.split() for line in
        (tmp_path / "scp/train/utt2spk").read_text().splitlines()
    )
    assert set(utt2spk.values()) == {"A1", "B2", "C3"}


def test_generate_scp_eval_speakers(tmp_path):
    for spkr in ("A1", "B2", "C3"):
        d = tmp_path / "wav" / spkr
        d.mkdir(parents=True)
        for i in range(6):
            (d / f"{i:03d}.wav").write_bytes(b"RIFF")
    _run("generate_scp", "--wavdir", tmp_path / "wav",
         "--scpdir", tmp_path / "scp", "--spkr_yml", tmp_path / "spkr.yml",
         "--dev_utterances", 2, "--eval_speakers", "C3")
    ev = (tmp_path / "scp/eval/wav.scp").read_text()
    assert "C3" in ev and "A1" not in ev


def test_rename_decoded(tmp_path):
    d = tmp_path / "wav"
    d.mkdir()
    (d / "30001_org-SF1_cv-TF2_gen.wav").write_bytes(b"RIFF")
    _run("rename_decoded", "--outwavdir", d)
    assert (d / "SF1" / "30001_org-SF1_cv-TF2.wav").exists()


def test_generate_results(tmp_path):
    outdir = tmp_path / "exp" / "conf1" / "eval_wav" / "1000"
    outdir.mkdir(parents=True)
    (outdir / "mcd.log").write_text(
        "A1 A1 5.0\nA1 B2 7.0\nB2 A1 9.0\n"
    )
    (outdir / "mosnet.log").write_text("A1 B2 3.5\nB2 A1 3.1\n")
    _run("generate_results", "--expdir", tmp_path / "exp",
         "--out", tmp_path / "RESULTS.md")
    txt = (tmp_path / "RESULTS.md").read_text()
    assert "MCD: 8.0" in txt  # mean over non-self pairs
    assert "MOSnet: 3.3" in txt


def test_yaml_default_merge(tmp_path, monkeypatch):
    from crank_tpu.utils.config import load_yaml

    default = {"a": 1, "nested": {"x": 1, "y": 2}, "keep": "d"}
    override = {"a": 5, "nested": {"y": 9}}
    yaml.safe_dump(default, open(tmp_path / "default.yml", "w"))
    yaml.safe_dump(override, open(tmp_path / "conf.yml", "w"))
    monkeypatch.setenv("CRANK_TPU_DEFAULT_YAML", str(tmp_path / "default.yml"))
    conf = load_yaml(tmp_path / "conf.yml")
    assert conf == {"a": 5, "nested": {"x": 1, "y": 9}, "keep": "d"}


def test_rename_decoded_underscored_names(tmp_path):
    """Utterance ids / speaker names with underscores (JVS-style) parse
    correctly through the shared naming contract."""
    d = tmp_path / "wav"
    d.mkdir()
    (d / "VOICEACTRESS100_001_org-jvs_001_cv-jvs_002_gen.wav").write_bytes(b"RIFF")
    _run("rename_decoded", "--outwavdir", d)
    assert (d / "jvs_001" /
            "VOICEACTRESS100_001_org-jvs_001_cv-jvs_002.wav").exists()


def test_naming_contract_roundtrip():
    from crank_tpu.utils.naming import format_decoded_stem, parse_decoded_stem

    stem = format_decoded_stem("utt_01_x", "spk_a", "spk_b")
    p = parse_decoded_stem(stem)
    assert p == ("utt_01_x", "spk_a", "spk_b", False)
    p = parse_decoded_stem(stem + "_gen")
    assert p.gen and p.uid == "utt_01_x"
    assert parse_decoded_stem("no_markers_here") is None


def test_world_synthesis(tmp_path):
    """bin/world_synthesis re-synthesizes a decoded mcep h5 dump (the
    stage-6 WORLD role, standalone)."""
    from crank_tpu.features.store import write_features
    from crank_tpu.native import world

    fs, fftl = 22050, 1024
    rng = np.random.default_rng(0)
    t = np.arange(int(0.4 * fs)) / fs
    x = 0.4 * np.sin(2 * np.pi * 150 * t) + 0.01 * rng.standard_normal(len(t))
    f0, spc, ap = world.analyze(x, fs, fftl=fftl, minf0=70, maxf0=340)
    mcep = world.sp2mc(spc, dim=34, alpha=0.466)
    cap = world.code_aperiodicity(ap, fs, fftl)

    dump = tmp_path / "dump" / "spkA"
    dump.mkdir(parents=True)
    write_features(dump / "u1_org-spkA_cv-spkB.h5",
                   {"feats": mcep, "f0": f0, "cap": cap, "rmcep": mcep})
    conf = tmp_path / "conf.yml"
    conf.write_text(yaml.safe_dump({"feature": {
        "fs": fs, "fftl": fftl, "shiftms": 5.0, "mcep_alpha": 0.466,
    }}))

    out = tmp_path / "wav"
    _run("world_synthesis", "--conf", conf,
         "--rootdir", tmp_path / "dump", "--outdir", out)
    wavf = out / "spkA" / "u1_org-spkA_cv-spkB.wav"
    assert wavf.exists()
    from crank_tpu.utils.audio_io import read_wav
    y, fs2 = read_wav(wavf)
    assert fs2 == fs and np.isfinite(y).all()
    assert np.sqrt(np.mean(np.asarray(y, np.float64) ** 2)) > 0.01


def test_analyzer_crosscheck_gating_and_pairing(tmp_path):
    """tools/analyzer_crosscheck.py: exits 2 with a clear message when
    pyworld/pysptk are absent (the zero-egress build env), and its
    ground-truth pairing follows the decoded-stem contract."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "analyzer_crosscheck", REPO / "tools" / "analyzer_crosscheck.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # pairing: per-speaker dir layout and flat <spkr>_<uid>.wav layout
    gt = tmp_path / "gt"
    (gt / "TM1").mkdir(parents=True)
    (gt / "TM1" / "30001.wav").write_bytes(b"RIFF")
    (gt / "SF1_30002.wav").write_bytes(b"RIFF")
    assert mod.find_gt_wav(gt, "TM1", "30001").name == "30001.wav"
    assert mod.find_gt_wav(gt, "SF1", "30002").name == "SF1_30002.wav"
    assert mod.find_gt_wav(gt, "TM1", "99999") is None

    has_pyworld = importlib.util.find_spec("pyworld") is not None
    if not has_pyworld:
        res = subprocess.run(
            [sys.executable, str(REPO / "tools" / "analyzer_crosscheck.py"),
             "--conf", "x", "--spkr_conf", "x", "--outwavdir", str(tmp_path),
             "--gt_wavdir", str(gt)],
            capture_output=True, text=True, timeout=120,
        )
        assert res.returncode == 2, res.stdout + res.stderr
        assert "pyworld" in res.stderr
