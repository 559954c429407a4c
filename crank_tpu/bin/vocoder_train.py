"""Neural-vocoder training CLI (first-party replacement for the external
parallel_wavegan trainer the reference depends on).

Pretraining:  --wav from scp + natural 'mlfb' features.
Fine-tuning:  --decoded_rootdir pointing at stage-4 reconstruction dumps
(decoded 'feats' h5) — the reference's PWG fine-tuning path.
"""

import argparse
import logging
import sys
from pathlib import Path

from crank_tpu.train.checkpoint import find_latest_checkpoint, load_checkpoint
from crank_tpu.utils import load_yaml, open_featsscp, open_scpdir
from crank_tpu.vocoder.train import (
    VocoderDataset,
    VocoderTrainer,
    aux_channels_for,
    aux_exts_for,
)

logging.basicConfig(level=logging.INFO, stream=sys.stdout)


def main():
    parser = argparse.ArgumentParser(description="Train neural vocoder")
    parser.add_argument("--conf", type=str)
    parser.add_argument("--scpdir", type=str)
    parser.add_argument("--featdir", type=str)
    parser.add_argument("--expdir", type=str)
    parser.add_argument("--decoded_rootdir", type=str, default=None,
                        help="fine-tune on decoded feature dumps")
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--n_steps", type=int, default=None)
    parser.add_argument("--finetune", action="store_true",
                        help="fine-tuning phase: train to n_steps + "
                             "finetune_steps (both from conf, so the "
                             "target is stable across watchdog relaunches)")
    args = parser.parse_args()

    conf = load_yaml(args.conf)
    voc_conf = conf.get("vocoder", {})
    # mel path conditions on mlfb; mcep path on [mcep, lcf0, uv]
    voc_conf.setdefault("aux_channels", aux_channels_for(conf))

    scp = open_scpdir(Path(args.scpdir) / "train")
    featdir = Path(args.featdir) / conf["feature"]["label"]
    feats = open_featsscp(featdir / "train" / "feats.scp")

    ext = aux_exts_for(conf)
    if args.decoded_rootdir:
        # map decoded h5 dumps back to their source uids by stem
        decoded = {}
        from crank_tpu.utils.naming import parse_decoded_stem

        for h5f in Path(args.decoded_rootdir).rglob("*.h5"):
            parsed = parse_decoded_stem(h5f.stem)
            stem = parsed.uid if parsed else h5f.stem
            spkr = h5f.parent.name
            decoded[f"{spkr}_{stem}"] = str(h5f)
        feats = decoded
        ext = aux_exts_for(conf, decoded=True)

    dataset = VocoderDataset(
        scp["wav"], feats, hop_size=conf["feature"]["hop_size"],
        batch_max_frames=voc_conf.get("batch_max_frames", 100), ext=ext,
    )

    resume_state = None
    ckpt = args.checkpoint or find_latest_checkpoint(args.expdir)
    if ckpt:
        logging.info("resume from %s", ckpt)
        resume_state = load_checkpoint(ckpt)
    trainer = VocoderTrainer(voc_conf, args.expdir,
                             resume_state=resume_state)
    n_steps = args.n_steps
    if args.finetune and n_steps is None:
        c = trainer.conf
        n_steps = c["n_steps"] + c.get("finetune_steps", 50000)
    try:
        trainer.train(dataset, n_steps=n_steps)
    except Exception as e:
        from crank_tpu.parallel.mesh import DeviceLostError

        # exit 76 = accelerator lost; the stage runner probe-waits and
        # relaunches from the latest checkpoint (bin/run.py stage 6)
        if isinstance(e, DeviceLostError) or "UNAVAILABLE" in str(e):
            logging.error("device lost: %s", e)
            sys.exit(76)
        raise
    if trainer.hit_memory_watchdog:
        sys.exit(75)  # EX_TEMPFAIL: checkpointed, caller should relaunch


if __name__ == "__main__":
    main()
