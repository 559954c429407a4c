"""Cluster job-dispatch backends (utils/launcher.py — the cmd.sh +
queue.pl/slurm.pl/ssh.pl role, /root/reference/egs/vaevc/template/cmd.sh)."""

import subprocess
import sys
from pathlib import Path

from crank_tpu.utils.launcher import Launcher


def test_local_and_empty_are_noops():
    for spec in ("", "local"):
        lc = Launcher(spec)
        assert not lc
        assert lc.wrap(["python", "-m", "x"]) == ["python", "-m", "x"]
        assert lc.wrap([Path("/a/b"), 3], job=7) == ["/a/b", "3"]


def test_slurm_backend():
    lc = Launcher("slurm")
    assert lc.wrap(["cmd", "a"]) == ["srun", "cmd", "a"]
    lc = Launcher("slurm:-p tpu --mem=16G")
    assert lc.wrap(["cmd"], job=3) == [
        "srun", "-p", "tpu", "--mem=16G", "cmd"
    ]


def test_sge_backend_job_substitution():
    lc = Launcher("sge:-l hostname=nodeJOB")
    got = lc.wrap(["cmd"], job=4)
    assert got[:5] == ["qrsh", "-now", "no", "-cwd", "-V"]
    assert "-l" in got and "hostname=node4" in got
    assert got[-1] == "cmd"


def test_ssh_round_robin_and_env_export(tmp_path):
    env = {"CRANK_TPU_DEFAULT_YAML": "/r/conf/default.yml",
           "PYTHONPATH": "/repo", "HOME": "/home/u"}
    lc = Launcher("ssh:h1,h2", cwd="/work dir", env=env)
    a1 = lc.wrap(["python", "-m", "mod"], job=1)
    a2 = lc.wrap(["python", "-m", "mod"], job=2)
    a3 = lc.wrap(["python", "-m", "mod"], job=3)
    assert a1[:3] == ["ssh", "-o", "BatchMode=yes"]
    assert a1[3] == "h1" and a2[3] == "h2" and a3[3] == "h1"  # wraps
    remote = a1[4]
    assert remote.startswith("cd '/work dir' && ")
    assert "CRANK_TPU_DEFAULT_YAML=/r/conf/default.yml" in remote
    assert "PYTHONPATH=/repo" in remote
    assert "HOME=" not in remote  # only recipe-relevant keys exported
    assert remote.endswith("python -m mod")
    # non-array command dispatches like job 1
    assert lc.wrap(["x"])[3] == "h1"


def test_ssh_hostfile(tmp_path):
    hf = tmp_path / "machines"
    hf.write_text("# .queue/machines format\nalpha  # gpu box\n\nbeta\n")
    lc = Launcher(f"ssh:@{hf}", env={})
    assert lc.hosts == ["alpha", "beta"]


def test_ssh_empty_hosts_rejected():
    import pytest

    with pytest.raises(ValueError):
        Launcher("ssh:")


def test_raw_prefix_legacy():
    lc = Launcher("nice -n 10")
    assert lc.wrap(["cmd"]) == ["nice", "-n", "10", "cmd"]
    lc = Launcher("ssh workerJOB")  # round-2 style: raw, not ssh backend?
    # 'ssh workerJOB' has no colon -> raw prefix with JOB substitution
    assert lc.wrap(["cmd"], job=2) == ["ssh", "worker2", "cmd"]


def test_run_cmd_routes_through_backend(tmp_path):
    """run.py's run_cmd/run_array accept both a Launcher and the legacy
    string form and actually execute the wrapped argv."""
    from crank_tpu.bin.run import run_array, run_cmd

    log = tmp_path / "a.log"
    run_cmd([sys.executable, "-c", "print('hi')"], log, Launcher(""))
    assert "hi" in log.read_text()
    # raw string prefix still works (legacy interface): `env VAR=...` as
    # the prefix, observed by the wrapped python body
    log2 = tmp_path / "b.log"
    run_cmd(
        [sys.executable, "-c", "import os; print(os.environ['CRANK_T'])"],
        log2, "env CRANK_T=yo",
    )
    assert "yo" in log2.read_text()
    import pytest

    with pytest.raises(SystemExit):
        run_cmd([sys.executable, "-c", "import sys; sys.exit(3)"],
                tmp_path / "c.log", Launcher(""))
    # array fan-out: per-job logs + JOB substitution through a raw backend
    run_array(
        lambda j: [sys.executable, "-c", f"print({j} * 10)"],
        lambda j: tmp_path / f"arr.log.{j}",
        3, Launcher(""),
    )
    for j in (1, 2, 3):
        assert str(j * 10) in (tmp_path / f"arr.log.{j}").read_text()
