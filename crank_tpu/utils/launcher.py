"""Cluster job-dispatch backends for the recipe runner.

The reference selects a Kaldi dispatch backend in ``cmd.sh``
(``cmd_backend="local"|"sge"|"slurm"|"ssh"``) and routes every stage
command through the matching perl launcher (``utils/run.pl``,
``queue.pl``, ``slurm.pl``, ``ssh.pl`` — unified ``JOB=1:N`` array-job
interface, see ``/root/reference/egs/vaevc/template/cmd.sh:1-30``).

This module is the tpu-native equivalent: a :class:`Launcher` maps each
stage command (and each array-job index) to a concrete ``argv`` prefix
for the selected backend.  The runner's process model stays the same —
``bin/run.py`` always Popens locally and captures the log; the backend
prefix decides *where* the command body executes:

==========  ============================================================
spec        behaviour
==========  ============================================================
``""`` /    run locally (run.pl role; the default)
``local``
``slurm``   ``srun`` per job — blocking, inherits cwd+env, so logs and
            exit codes flow back through the runner unchanged
            (slurm.pl role).  ``slurm:<extra srun flags>`` appends
            scheduler options, e.g. ``slurm:-p tpu --mem=16G``.
``sge``     ``qrsh -now no -cwd -V`` per job (queue.pl role, interactive
            variant so stdout/exit codes stream back).  ``sge:<flags>``
            appends, e.g. ``sge:-l mem_free=8G``.
``ssh``     round-robin over an explicit host list (ssh.pl role):
            ``ssh:host1,host2`` or ``ssh:@path/to/hostfile`` (one host
            per line, ``#`` comments — the ``.queue/machines`` format).
            Array job *j* lands on ``hosts[(j-1) % len]``; the remote
            command re-creates the runner's cwd and the recipe env vars.
anything    legacy raw-prefix: the string is shlex-split and prepended
else        verbatim; a literal ``JOB`` is substituted with the array
            index (round-2 behaviour, kept for compatibility).
==========  ============================================================

Like the perl launchers, a literal ``JOB`` anywhere in the backend flags
is substituted with the 1-based array index (e.g. a per-job scratch
partition).  Non-array stage commands use index 1.
"""

import os
import shlex
from pathlib import Path

# env vars the runner derives per-recipe; ssh remotes don't inherit the
# runner's environment, so these are re-exported in the remote command
_SSH_ENV_KEYS = ("CRANK_TPU_DEFAULT_YAML", "CRANK_DEFAULT_YAML",
                 "PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")


def _parse_hosts(arg):
    if arg.startswith("@"):
        lines = Path(arg[1:]).read_text().splitlines()
        hosts = [ln.split("#")[0].strip() for ln in lines]
        hosts = [h for h in hosts if h]
    else:
        hosts = [h.strip() for h in arg.split(",") if h.strip()]
    if not hosts:
        raise ValueError(f"ssh launcher: empty host list ({arg!r})")
    return hosts


class Launcher:
    """Build per-command argv prefixes for a dispatch backend spec."""

    def __init__(self, spec="", cwd=None, env=None):
        self.spec = spec or ""
        self.cwd = str(cwd or os.getcwd())
        self.env = env if env is not None else dict(os.environ)
        backend, _, arg = self.spec.partition(":")
        self.backend = backend
        self.arg = arg
        if backend in ("", "local"):
            self.backend = "local"
        elif backend == "slurm":
            self.flags = shlex.split(arg)
        elif backend == "sge":
            self.flags = shlex.split(arg)
        elif backend == "ssh":
            self.hosts = _parse_hosts(arg)
        else:
            # legacy raw prefix (round-2 interface): whole spec is the
            # prefix, JOB substitution applies to all of it
            self.backend = "raw"

    def __bool__(self):
        return self.backend != "local"

    def wrap(self, cmd, job=None):
        """Return the full argv for ``cmd`` under this backend.

        ``job`` is the 1-based array index (None for plain stage
        commands, which dispatch like job 1).
        """
        cmd = [str(c) for c in cmd]
        j = 1 if job is None else int(job)
        if self.backend == "local":
            return cmd
        if self.backend == "raw":
            return shlex.split(self.spec.replace("JOB", str(j))) + cmd
        if self.backend == "slurm":
            flags = [f.replace("JOB", str(j)) for f in self.flags]
            # srun inherits cwd + env of the runner on the allocated node
            return ["srun"] + flags + cmd
        if self.backend == "sge":
            flags = [f.replace("JOB", str(j)) for f in self.flags]
            # -now no: queue instead of failing when no slot is free
            # -cwd -V: queue.pl parity (run where/like the runner runs)
            return ["qrsh", "-now", "no", "-cwd", "-V"] + flags + cmd
        if self.backend == "ssh":
            host = self.hosts[(j - 1) % len(self.hosts)]
            envs = " ".join(
                f"{k}={shlex.quote(self.env[k])}"
                for k in _SSH_ENV_KEYS if self.env.get(k)
            )
            inner = " ".join(shlex.quote(c) for c in cmd)
            remote = f"cd {shlex.quote(self.cwd)} && {envs} {inner}"
            return ["ssh", "-o", "BatchMode=yes", host, remote]
        raise AssertionError(self.backend)
