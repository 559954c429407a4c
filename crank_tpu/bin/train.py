"""Train/eval/reconstruction entry point (reference: crank/bin/train.py).

Builds {G[, D][, C][, SPKRADV]}, restores/initializes state, and dispatches
the Trainer with --flag train / reconstruction / eval.  Unlike the reference
(which forbids CPU, train.py:158-159) this runs on whatever JAX backend is
available — TPU in production, CPU for CI.
"""

import argparse
import faulthandler
import logging
import signal
import sys
from pathlib import Path

import jax

# diagnosing hangs: `kill -USR1 <pid>` dumps all thread stacks to stderr
faulthandler.register(signal.SIGUSR1, all_threads=True)

from crank_tpu.features.scaler import load_scaler
from crank_tpu.parallel.mesh import DeviceLostError
from crank_tpu.train.checkpoint import find_latest_checkpoint, load_checkpoint
from crank_tpu.train.dataset import get_dataloaders
from crank_tpu.train.factory import build_models, init_models
from crank_tpu.train.optim import make_optimizers, warmstart_sched_anchors
from crank_tpu.train.trainer import Trainer
from crank_tpu.utils import load_yaml, open_featsscp, open_scpdir

logging.basicConfig(
    level=logging.INFO,
    stream=sys.stdout,
    format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
)


def main():
    parser = argparse.ArgumentParser(description="Train VQ-VAE model")
    parser.add_argument("--flag", help='flag ["train", "eval", "reconstruction"]')
    parser.add_argument("--n_jobs", type=int, default=-1)
    parser.add_argument("--conf", type=str)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--scpdir", type=str)
    parser.add_argument("--featdir", type=str)
    parser.add_argument("--featsscp", type=str, default="None")
    parser.add_argument("--expdir", type=str)
    args = parser.parse_args()

    conf = load_yaml(args.conf)
    for k, v in conf.items():
        logging.info("%s: %s", k, v)

    scp = {}
    featdir = Path(args.featdir) / conf["feature"]["label"]
    for phase in ("train", "dev", "eval"):
        scp[phase] = open_scpdir(Path(args.scpdir) / phase)
        scp[phase]["feats"] = open_featsscp(featdir / phase / "feats.scp")
    if args.flag == "eval" and args.featsscp != "None":
        logging.info("Load feats.scp from %s", args.featsscp)
        scp["eval"]["feats"] = open_featsscp(args.featsscp)

    expdir = Path(args.expdir) / Path(args.conf).stem
    expdir.mkdir(exist_ok=True, parents=True)
    spkr_size = len(scp["train"]["spkrs"])

    scaler = load_scaler(featdir / "scaler.pkl")
    models = build_models(conf, spkr_size, scaler=scaler)
    # conf-level seed (default 1234 = the reference entry's fixed seeding,
    # crank/bin/train.py:49-52); the loader keeps its historical seed-0
    # stream at the default so existing runs/tests are bit-unchanged.
    # Used by the xfw seed-variance experiments (docs/TRAIN_PARITY.md).
    seed = int(conf.get("seed", 1234))
    dataloaders = get_dataloaders(conf, scp, scaler, flag=args.flag,
                                  seed=seed - 1234)

    # initialize / restore
    resume = 0
    ckpt = None
    if args.checkpoint not in (None, "None"):
        ckpt = args.checkpoint
    elif args.flag in ("reconstruction", "eval"):
        ckpt = find_latest_checkpoint(expdir)
        assert ckpt is not None, f"no checkpoint under {expdir}"
    rng_key = None
    sched_anchors = None
    if ckpt is not None:
        logging.info("load checkpoint: %s", ckpt)
        payload = load_checkpoint(ckpt)
        params, ema, opt = payload["params"], payload["ema"], payload["opt"]
        resume = payload["steps"]
        rng_key = payload.get("rng")
        # anchors persisted at warm-start time survive later relaunches;
        # absent (plain resume / pre-anchor checkpoint) = conf-derived
        sched_anchors = payload.get("sched_anchors")
        missing = [m for m in models if m not in params]
        if missing:
            # warm-start: e.g. resuming a vqvae-pretrain checkpoint under
            # an lsgan/cyclegan/stargan conf, where D did not exist yet.
            # Fresh-init the missing sub-models; their optimizers start at
            # count 0, and the StepLR anchors are re-derived from the
            # ACTUAL timeline (resume may exceed n_steps_gan_start, moving
            # D's first update and shrinking the stop-generator window).
            # The reference has no equivalent — it must train all phases
            # in a single run.
            logging.info("fresh-init sub-models missing from the "
                         "checkpoint: %s", missing)
            sched_anchors = warmstart_sched_anchors(
                conf, list(models.keys()), resume, missing
            )
            opts = make_optimizers(conf, list(models.keys()), sched_anchors)
            fresh_params, _ = init_models(
                models, conf, spkr_size, jax.random.PRNGKey(seed),
                T=dataloaders["batch_len"],
            )
            for m in missing:
                params[m] = fresh_params[m]
                opt[m] = opts[m].init(params[m])
        else:
            opts = make_optimizers(conf, list(models.keys()), sched_anchors)
    else:
        params, ema = init_models(
            models, conf, spkr_size, jax.random.PRNGKey(seed),
            T=dataloaders["batch_len"],
        )
        opts = make_optimizers(conf, list(models.keys()))
        opt = {m: opts[m].init(params[m]) for m in models}

    writer = None
    if args.flag == "train":
        try:
            from tensorboardX import SummaryWriter

            writer = {
                "train": SummaryWriter(
                    logdir=str(Path(args.expdir) / "runs" / f"train-{expdir.name}")
                ),
                "dev": SummaryWriter(
                    logdir=str(Path(args.expdir) / "runs" / f"dev-{expdir.name}")
                ),
            }
        except ImportError:  # pragma: no cover
            logging.info("tensorboardX unavailable; scalar logging disabled")

    trainer = Trainer(
        models,
        opts,
        conf,
        dataloaders,
        scaler,
        expdir=expdir,
        writer=writer,
        resume=resume,
        rng_key=rng_key,
        rng_seed=seed,
        init_state={"params": params, "ema": ema, "opt": opt},
        n_jobs=args.n_jobs,
        sched_anchors=sched_anchors,
    )
    if args.flag == "train":
        # preemption-safe resume: a SIGTERM (pod preemption notice /
        # scheduler eviction) checkpoints at the next step boundary and
        # exits EX_TEMPFAIL for the runner's relaunch loop, instead of
        # dying with everything since the last save cadence lost
        signal.signal(signal.SIGTERM, trainer.request_preempt_checkpoint)
    try:
        trainer.run(flag=args.flag)
    except DeviceLostError as e:
        # EX_PROTOCOL(76): the accelerator stopped answering mid-run.
        # State since the last checkpoint is unrecoverable (it lives on
        # the lost device); the stage runner probe-waits for the device
        # and relaunches from the latest checkpoint (bin/run.py).
        logging.error("device lost: %s", e)
        sys.exit(76)
    except Exception as e:  # jax runtime "UNAVAILABLE: TPU worker ..."
        if "UNAVAILABLE" in str(e):
            logging.error("device lost (runtime UNAVAILABLE): %s", e)
            sys.exit(76)
        raise
    if trainer.hit_memory_watchdog:
        # EX_TEMPFAIL: checkpointed at the host-memory ceiling; the stage
        # runner relaunches from the checkpoint (segmented training)
        sys.exit(75)


if __name__ == "__main__":
    main()
