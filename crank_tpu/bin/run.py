"""Recipe stage runner — the Python replacement for the reference's
bash/perl orchestration layer (egs/vaevc/template/run.sh + utils/*.pl,
SURVEY.md §2.2).

Eight stages, same numbering and directory conventions as the reference:

  0  download corpus + generate scp
  1  initialization (F0/power histograms for spkr.yml tuning), then stop
  2  feature extraction (train/dev/eval) + statistics
  3  VQVAE training
  4  reconstruction dumps (for vocoder fine-tuning)
  5  conversion decoding (eval)
  6  waveform synthesis (GL native; PWG via external parallel-wavegan CLIs)
  7  objective evaluation (MCD + MOSnet)

Each stage runs as a subprocess with stdout/stderr captured to a log file
(run.pl-style).  ``--launcher`` selects the dispatch backend
(``utils/launcher.py`` — ``slurm[:flags]`` / ``sge[:flags]`` /
``ssh:hosts`` / raw prefix), replacing cmd.sh + queue.pl/slurm.pl/ssh.pl.
"""

import argparse
import os
import subprocess
import sys
from pathlib import Path

from crank_tpu.utils.launcher import Launcher

RELAUNCH = 75  # EX_TEMPFAIL: checkpointed at a resource ceiling, relaunch
DEVICE_LOST = 76  # EX_PROTOCOL: accelerator stopped answering mid-run


def wait_for_device(env, probe_timeout=150, max_wait_s=2400):
    """Block until the accelerator answers a trivial jit, with backoff.

    Each probe is a fresh subprocess (a wedged PJRT client cannot recover
    in-process); tunneled pool chips have been observed to come back
    5-25 minutes after a hang, so the ceiling is generous and a
    permanently-dead device raises instead of spinning forever."""
    import time

    probe = ("import numpy as np, jax.numpy as jnp; "
             "print(np.asarray(jnp.ones(4) + 1.0)[0])")
    waited, pause = 0.0, 60
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe], env=env,
                timeout=probe_timeout, capture_output=True,
            )
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if waited >= max_wait_s:
            raise SystemExit(
                f"accelerator did not answer probes for {waited:.0f}s"
            )
        time.sleep(pause)
        waited += pause
        pause = min(pause * 1.5, 300)


def _wrap(cmd, launcher, job=None):
    if not launcher:
        return [str(c) for c in cmd]
    if isinstance(launcher, str):
        launcher = Launcher(launcher)
    return launcher.wrap(cmd, job=job)


def run_cmd(cmd, log, launcher="", env=None, ok_codes=(0,)):
    log = Path(log)
    log.parent.mkdir(parents=True, exist_ok=True)
    cmd = _wrap(cmd, launcher)
    print(f"[run] {' '.join(map(str, cmd))} (log: {log})", flush=True)
    with open(log, "w") as fp:
        ret = subprocess.run(
            [str(c) for c in cmd], stdout=fp, stderr=subprocess.STDOUT, env=env
        )
    if ret.returncode not in ok_codes:
        print(open(log).read()[-4000:], file=sys.stderr)
        raise SystemExit(f"stage command failed (see {log})")
    return ret.returncode


def run_array(cmd_for_job, log_for_job, n, launcher="", env=None,
              ok_codes=(0,)):
    """Array-job dispatch (utils/run.pl JOB=1:N role): launch ``n``
    concurrent jobs, one log each (log.1 .. log.n naming), join barrier,
    fail if any job fails.  The launcher backend decides where each job
    index lands (ssh round-robin / per-job srun / qrsh; a literal ``JOB``
    in backend flags is substituted with the index)."""
    procs = []
    for j in range(1, n + 1):
        cmd = _wrap(cmd_for_job(j), launcher, job=j)
        log = Path(log_for_job(j))
        log.parent.mkdir(parents=True, exist_ok=True)
        print(f"[run:{j}/{n}] {' '.join(cmd)} (log: {log})", flush=True)
        fp = open(log, "w")
        procs.append(
            (subprocess.Popen(cmd, stdout=fp, stderr=subprocess.STDOUT,
                              env=env), log, fp)
        )
    failed = []
    for p, log, fp in procs:
        code = p.wait()
        fp.close()
        if code not in ok_codes:
            failed.append(log)
    if failed:
        for log in failed:
            print(open(log).read()[-2000:], file=sys.stderr)
        raise SystemExit(
            f"{len(failed)}/{n} array jobs failed (see {failed})"
        )


def main():
    parser = argparse.ArgumentParser(description="crank-tpu recipe runner")
    parser.add_argument("--recipe", type=str, required=True,
                        help="recipe directory (e.g. egs/vaevc/vcc2018v1)")
    parser.add_argument("--conf", type=str, default="conf/mlfb_vqvae.yml")
    parser.add_argument("--spkr_yml", type=str, default="conf/spkr.yml")
    parser.add_argument("--stage", type=int, default=0)
    parser.add_argument("--stop_stage", type=int, default=7)
    parser.add_argument("--n_jobs", type=int, default=-1)
    parser.add_argument("--voc", type=str, default="GL",
                        choices=["GL", "WORLD", "PWG", "NPWG"],
                        help="GL=Griffin-Lim (mcep confs synthesize "
                             "parametrically instead, = WORLD), "
                             "WORLD=parametric synthesis (mcep only), "
                             "NPWG=in-tree neural vocoder, "
                             "PWG=external parallel_wavegan package")
    parser.add_argument("--voc_expdir", type=str, default="downloads/PWG")
    parser.add_argument("--voc_checkpoint", type=str, default=None,
                        help="explicit NPWG vocoder checkpoint for stage-6 "
                             "decoding (default: latest in exp/vocoder — "
                             "i.e. the fine-tuned one when stage 6 ran the "
                             "fine-tune phase)")
    parser.add_argument("--resume_checkpoint", type=str, default="None",
                        help="stage-3 resume: a checkpoint path, or "
                             "LATEST to auto-pick the newest checkpoint "
                             "under the experiment dir; stage 3 refuses "
                             "to restart over existing checkpoints")
    parser.add_argument("--decode_checkpoint", type=str, default="None")
    parser.add_argument("--dev_utterances", type=int, default=3)
    parser.add_argument("--eval_utterances", type=int, default=5)
    parser.add_argument("--eval_speakers", type=str, nargs="*", default=[""])
    parser.add_argument("--launcher", type=str, default="",
                        help="cluster dispatch backend (cmd.sh role): "
                             "'' / local, 'slurm[:srun flags]', "
                             "'sge[:qrsh flags]', 'ssh:h1,h2' or "
                             "'ssh:@hostfile', or a raw command prefix; "
                             "a literal JOB in backend flags is replaced "
                             "by the array-job index in fan-out stages")
    parser.add_argument("--n_parallel_jobs", type=int, default=1,
                        help="array-job fan-out width for per-utterance "
                             "stages (2: feature extraction, 7: MCD) — "
                             "the JOB=1:N role of utils/run.pl")
    parser.add_argument("--mosnet_weights", type=str, default=None)
    args = parser.parse_args()

    recipe = Path(args.recipe)
    conf = recipe / args.conf if not Path(args.conf).is_absolute() else Path(args.conf)
    spkr_yml = (
        recipe / args.spkr_yml
        if not Path(args.spkr_yml).is_absolute()
        else Path(args.spkr_yml)
    )
    confname = conf.stem
    datadir = recipe / "data"
    scpdir = datadir / "scp"
    featdir = datadir / "feature"
    logdir = datadir / "log"
    expdir = recipe / "exp"
    downloads = recipe / "downloads"
    for d in (datadir, featdir, logdir, expdir):
        d.mkdir(parents=True, exist_ok=True)

    env = dict(os.environ)
    env["CRANK_TPU_DEFAULT_YAML"] = str(recipe / "conf" / "default.yml")
    env.setdefault("PYTHONPATH", str(Path(__file__).resolve().parents[2]))

    from crank_tpu.utils.config import load_yaml

    # stage-6/7 routing must see the conf the tools see: merged over
    # default.yml (a recipe conf may inherit feat types), and keyed on
    # *output*_feat_type — dumps/synthesis/MCD semantics follow what the
    # decoder emits (evaluate_mcd branches on output_feat_type too), not
    # what the encoder eats (input mlfb / output mcep is a valid conf)
    merged_d = load_yaml(conf, default_ymlf=recipe / "conf" / "default.yml")
    feat_type = merged_d.get(
        "output_feat_type", merged_d.get("input_feat_type", "mlfb")
    )
    if args.decode_checkpoint != "None":
        n_decode_steps = "".join(
            c for c in Path(args.decode_checkpoint).stem if c.isdigit()
        )
    else:
        n_decode_steps = str(merged_d.get("n_steps"))

    py = [sys.executable, "-m"]
    L = Launcher(args.launcher, env=env)

    def stage_in(n):
        return args.stage <= n <= args.stop_stage

    if stage_in(0):
        print("stage 0: download dataset and generate scp")
        dl = recipe / "local" / "download.py"
        if dl.exists():
            run_cmd([sys.executable, dl, "--downloaddir", downloads],
                    logdir / "download.log", L, env)
        run_cmd(
            py + ["crank_tpu.bin.generate_scp",
                  "--wavdir", downloads / "wav",
                  "--scpdir", scpdir,
                  "--spkr_yml", spkr_yml,
                  "--dev_utterances", args.dev_utterances,
                  "--eval_utterances", args.eval_utterances,
                  "--eval_speakers"] + args.eval_speakers,
            logdir / "generate_scp.log", L, env,
        )

    # stage 1 always exits afterwards so the user can tune spkr.yml
    # (reference run.sh:89-100 has the same hard `exit`)
    if stage_in(1):
        print("stage 1: initialization (histograms)")
        run_cmd(
            py + ["crank_tpu.bin.generate_histogram",
                  "--n_jobs", args.n_jobs,
                  "--wav_dir", downloads / "wav",
                  "--figure_dir", datadir / "figure"],
            logdir / "generate_histogram.log", L, env,
        )
        print("stage 1 done: set minf0/maxf0/npow in", spkr_yml)
        return

    if stage_in(2):
        print("stage 2: feature extraction and statistics")
        npar = args.n_parallel_jobs
        for phase in ("train", "dev", "eval"):
            base = py + ["crank_tpu.bin.extract_feature",
                         "--n_jobs", args.n_jobs, "--phase", phase,
                         "--conf", conf, "--spkr_yml", spkr_yml,
                         "--scpdir", scpdir, "--featdir", featdir]
            if npar > 1:
                run_array(
                    lambda j, base=base: base + ["--job_index", j,
                                                 "--n_splits", npar],
                    lambda j, phase=phase: (
                        logdir / f"extract_feature_{phase}.log.{j}"
                    ),
                    npar, L, env,
                )
            else:
                run_cmd(base, logdir / f"extract_feature_{phase}.log",
                        L, env)
        run_cmd(
            py + ["crank_tpu.bin.extract_statistics",
                  "--n_jobs", args.n_jobs, "--phase", "train",
                  "--conf", conf, "--scpdir", scpdir, "--featdir", featdir],
            logdir / "extract_statistics.log", L, env,
        )

    def train_cmd(flag, ckpt, log, ok_codes=(0,)):
        return run_cmd(
            py + ["crank_tpu.bin.train", "--flag", flag,
                  "--n_jobs", args.n_jobs, "--conf", conf,
                  "--checkpoint", ckpt, "--scpdir", scpdir,
                  "--featdir", featdir, "--expdir", expdir],
            log, L, env, ok_codes=ok_codes,
        )

    if stage_in(3):
        print("stage 3: train")
        # segmented training: the trainer checkpoints and exits RELAUNCH
        # when it hits the host-memory ceiling (trainer max_host_rss_gb);
        # relaunch from the latest checkpoint until it finishes cleanly
        from crank_tpu.train.checkpoint import find_latest_checkpoint

        ckpt = args.resume_checkpoint
        if ckpt in ("", "None"):
            existing = find_latest_checkpoint(expdir / confname)
            if existing is not None:
                # re-running stage 3 without --resume_checkpoint would
                # restart from step 0 and progressively overwrite the
                # step-named checkpoints of an interrupted long run
                raise SystemExit(
                    f"stage 3: {existing} already exists — resume with "
                    f"--resume_checkpoint {existing} (or LATEST), or move "
                    f"{expdir / confname} aside to restart from scratch"
                )
        elif ckpt == "LATEST":
            latest = find_latest_checkpoint(expdir / confname)
            if latest is None:
                raise SystemExit(
                    f"--resume_checkpoint LATEST: no checkpoint under "
                    f"{expdir / confname}"
                )
            ckpt = str(latest)
            print(f"[run] resuming from {ckpt}")
        # don't clobber logs of a previous invocation: continue the
        # train.log / train.segN.log numbering after the last existing one
        seg0 = 0
        while (expdir / confname / (
                "train.log" if seg0 == 0 else f"train.seg{seg0}.log"
        )).exists():
            seg0 += 1
        device_losses = 0
        for segment in range(seg0, seg0 + 1000):
            log = expdir / confname / (
                "train.log" if segment == 0 else f"train.seg{segment}.log"
            )
            code = train_cmd("train", ckpt, log,
                             ok_codes=(0, RELAUNCH, DEVICE_LOST))
            if code == 0:
                break
            latest = find_latest_checkpoint(expdir / confname)
            if latest is None:
                # exit 75/76 promise a checkpoint; restarting from scratch
                # with '--checkpoint None' would silently lose all progress
                raise SystemExit(
                    "trainer requested a relaunch but no checkpoint exists "
                    f"under {expdir / confname} — aborting (disk full? "
                    "non-writer host?)"
                )
            if code == DEVICE_LOST:
                # accelerator stopped answering (tunnel drop, worker
                # preemption, pool reclaim) — probe-wait for it to come
                # back, then resume from the latest checkpoint; bounded so
                # a permanently-gone device fails loudly instead of
                # looping forever
                device_losses += 1
                if device_losses > 12:
                    raise SystemExit(
                        f"device lost {device_losses} times — giving up "
                        f"(latest checkpoint: {latest})"
                    )
                print(f"[run] device lost (#{device_losses}); waiting for "
                      "the accelerator to answer a probe ...")
                wait_for_device(env)
                print(f"[run] device back; resuming from {latest}")
            else:
                print(f"[run] memory-watchdog relaunch from {latest}")
            ckpt = str(latest)

    if stage_in(4):
        print("stage 4: reconstruction")
        train_cmd("reconstruction", args.decode_checkpoint,
                  expdir / confname / "reconstruction.log")

    if stage_in(5):
        print("stage 5: decode")
        train_cmd("eval", args.decode_checkpoint,
                  expdir / confname / "decode.log")

    if args.voc == "WORLD" and feat_type != "mcep":
        raise SystemExit(
            "--voc WORLD needs WORLD features (output_feat_type: mcep); "
            "this conf decodes mel — use --voc GL / NPWG / PWG"
        )
    if feat_type == "mcep" and args.voc in ("GL", "WORLD"):
        # the parametric-synthesis path keeps the wavs next to the dumps
        outdir = expdir / confname / "eval_wav" / n_decode_steps
    else:
        outdir = (
            expdir / confname
            / f"eval_{Path(args.voc_expdir).name}_wav" / n_decode_steps
        )

    if stage_in(6):
        print("stage 6: synthesis")
        (outdir / "wav").mkdir(parents=True, exist_ok=True)
        eval_wav = expdir / confname / "eval_wav" / n_decode_steps
        if args.voc in ("GL", "WORLD") and feat_type == "mcep":
            # WORLD synthesis from the decoded [mcep, f0, cap(, rmcep)]
            # dumps.  The reference's run.sh runs GL here regardless of
            # feat_type, which cannot work on mel-cepstra (mlfb basis
            # shape mismatch, template/run.sh:183-190) — its mcep eval
            # wavs never exist; we synthesize them with the native WORLD
            # synthesizer so stage 7's MOSnet has inputs.  --voc NPWG/PWG
            # route mcep dumps through the neural vocoders instead.
            run_cmd(
                py + ["crank_tpu.bin.world_synthesis", "--n_jobs",
                      args.n_jobs, "--conf", conf, "--rootdir", eval_wav,
                      "--outdir", outdir / "wav"],
                outdir / "world_synthesis.log", L, env,
            )
        elif args.voc == "GL":
            run_cmd(
                py + ["crank_tpu.bin.griffin_lim", "--n_jobs", args.n_jobs,
                      "--conf", conf, "--rootdir", eval_wav,
                      "--outdir", outdir / "wav"],
                outdir / "griffin_lim_decode.log", L, env,
            )
        elif args.voc == "NPWG":  # in-tree neural vocoder
            voc_expdir = expdir / "vocoder"

            def voc_train_cmd(log, extra=()):
                # segmented (memory-watchdog) training: exit RELAUNCH =
                # checkpointed, run again (the CLI auto-resumes from the
                # latest checkpoint in the expdir); exit DEVICE_LOST =
                # probe-wait for the accelerator first
                losses = 0
                for segment in range(1000):
                    seg_log = log if segment == 0 else Path(
                        f"{log}.seg{segment}")
                    code = run_cmd(
                        py + ["crank_tpu.bin.vocoder_train", "--conf", conf,
                              "--scpdir", scpdir, "--featdir", featdir,
                              "--expdir", voc_expdir, *extra],
                        seg_log, L, env,
                        ok_codes=(0, RELAUNCH, DEVICE_LOST),
                    )
                    if code == 0:
                        return
                    if code == DEVICE_LOST:
                        losses += 1
                        if losses > 12:
                            raise SystemExit(
                                f"device lost {losses} times during "
                                "vocoder training — giving up")
                        print(f"[run] device lost (#{losses}) in vocoder "
                              "training; probing ...")
                        wait_for_device(env)

            # pretrain on natural pairs, then fine-tune on stage-4 dumps.
            # Both invocations auto-resume from the latest checkpoint and
            # exit immediately once their step target is reached, so
            # re-running stage 6 after any interruption (not just watchdog
            # relaunches) completes the remaining training instead of
            # silently decoding with a partially-trained vocoder.
            # (--finetune extends the target past the pretraining n_steps
            # by conf vocoder.finetune_steps — config-derived, stable
            # across relaunches.)
            voc_train_cmd(outdir / "vocoder_train.log")
            recon = expdir / confname / "reconstruction" / n_decode_steps
            if recon.exists():
                voc_train_cmd(outdir / "vocoder_finetune.log",
                              ("--decoded_rootdir", recon, "--finetune"))
            voc_ckpt = (
                ["--checkpoint", args.voc_checkpoint]
                if args.voc_checkpoint else []
            )
            run_cmd(
                py + ["crank_tpu.bin.vocoder_decode", "--conf", conf,
                      "--rootdir", eval_wav, "--outdir", outdir / "wav",
                      "--expdir", voc_expdir, *voc_ckpt],
                outdir / "vocoder_decode.log", L, env,
            )
        else:  # PWG via external parallel-wavegan package
            voc_expdir = Path(args.voc_expdir)
            if not voc_expdir.is_absolute():
                voc_expdir = recipe / voc_expdir
            ckpts = sorted(voc_expdir.rglob("*.pkl"),
                           key=lambda p: p.stat().st_mtime)
            if not ckpts:
                # bootstrap the published pretrained bundle
                # (local/download_pretrained_vocoder.sh role)
                fetcher = (Path(__file__).resolve().parents[2]
                           / "tools" / "fetch_pretrained.py")
                run_cmd(
                    [sys.executable, fetcher, "--preset", "PWG",
                     "--outdir", voc_expdir],
                    outdir / "fetch_pretrained.log", L, env,
                )
                ckpts = sorted(voc_expdir.rglob("*.pkl"),
                               key=lambda p: p.stat().st_mtime)
            if not ckpts:
                raise SystemExit(
                    f"PWG vocoder checkpoint not found under {voc_expdir}; "
                    "download a pretrained parallel-wavegan model there "
                    "(tools/fetch_pretrained.py --preset PWG) or use "
                    "--voc GL / --voc NPWG"
                )
            run_cmd(
                ["parallel-wavegan-normalize", "--skip-wav-copy",
                 "--rootdir", eval_wav,
                 "--config", voc_expdir / "config.yml",
                 "--stats", voc_expdir / "stats.h5",
                 "--dumpdir", outdir / "hdf5_norm", "--verbose", "1"],
                outdir / "normalize.log", L, env,
            )
            run_cmd(
                ["parallel-wavegan-decode", "--dumpdir", outdir / "hdf5_norm",
                 "--checkpoint", ckpts[-1], "--outdir", outdir / "wav",
                 "--verbose", "1"],
                outdir / "pwg_decode.log", L, env,
            )
            run_cmd(
                py + ["crank_tpu.bin.rename_decoded",
                      "--outwavdir", outdir / "wav"],
                outdir / "rename_decoded.log", L, env,
            )

    if stage_in(7):
        print("stage 7: evaluation")
        # mcep MCD reads the decoded [mcep, f0] h5 dumps directly (no
        # vocoder round-trip, reference evaluate_mcd.py:52-57); mlfb MCD
        # re-analyzes the synthesized wavs, as do mcep confs when stage 6
        # vocoded the dumps neurally (--voc NPWG/PWG measures the wavs)
        mcep_direct = feat_type == "mcep" and args.voc in ("GL", "WORLD")
        mcd_src = (expdir / confname / "eval_wav" / n_decode_steps
                   if mcep_direct else outdir / "wav")
        mcd_base = py + ["crank_tpu.bin.evaluate_mcd", "--conf", conf,
                         "--n_jobs", args.n_jobs, "--spkr_conf", spkr_yml,
                         "--outwavdir", mcd_src, "--featdir", featdir]
        if feat_type == "mcep" and not mcep_direct:
            mcd_base += ["--from_wav"]
        npar = args.n_parallel_jobs
        if npar > 1:
            run_array(
                lambda j: mcd_base + ["--job_index", j, "--n_splits", npar,
                                      "--out", outdir / f"mcd_utt.log.{j}"],
                lambda j: outdir / f"mcd_run.log.{j}",
                npar, L, env,
            )
            run_cmd(
                mcd_base + ["--merge_from"]
                + [outdir / f"mcd_utt.log.{j}" for j in range(1, npar + 1)]
                + ["--out", outdir / "mcd.log"],
                outdir / "mcd_merge.log", L, env,
            )
        else:
            run_cmd(mcd_base + ["--out", outdir / "mcd.log"],
                    outdir / "mcd_run.log", L, env)
        mos_cmd = py + ["crank_tpu.bin.evaluate_mosnet",
                        "--outwavdir", outdir / "wav",
                        "--out", outdir / "mosnet.log"]
        mosnet_weights = args.mosnet_weights
        if mosnet_weights is None:
            # bootstrap the published MOSNet checkpoint (fetch + Keras->flax
            # conversion); scores are random-init noise without real weights,
            # so try hard before falling back
            tools = Path(__file__).resolve().parents[2] / "tools"
            npz = downloads / "MOSNet" / "mosnet.npz"
            if not npz.exists():
                try:
                    run_cmd(
                        [sys.executable, tools / "fetch_pretrained.py",
                         "--preset", "MOSNET", "--ext", "h5",
                         "--outdir", npz.parent],
                        outdir / "fetch_mosnet.log", L, env,
                    )
                    keras_h5 = next(npz.parent.rglob("*.h5"))
                    run_cmd(
                        [sys.executable, tools / "convert_mosnet.py",
                         "--keras_h5", keras_h5, "--out", npz],
                        outdir / "convert_mosnet.log", L, env,
                    )
                except (SystemExit, StopIteration):
                    print("MOSNet weights unavailable (offline?) — stage 7 "
                          "MOS scores will be random-init noise")
            if npz.exists():
                mosnet_weights = str(npz)
        if mosnet_weights:
            mos_cmd += ["--weights", mosnet_weights]
        # MOSnet is tiny; run it on CPU so it never queues behind the chip
        mos_env = dict(env, CRANK_TPU_PLATFORM="cpu")
        run_cmd(mos_cmd, outdir / "mosnet_run.log", L, mos_env)
        print("results:", outdir / "mcd.log", outdir / "mosnet.log")


if __name__ == "__main__":
    main()
