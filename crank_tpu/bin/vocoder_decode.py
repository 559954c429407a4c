"""Neural-vocoder decoding CLI (parallel-wavegan-decode role): converts
decoded-feature h5 dumps ('feats') to waveforms with a trained vocoder."""

import argparse
import logging
import sys
from pathlib import Path

from crank_tpu.train.checkpoint import find_latest_checkpoint, load_checkpoint
from crank_tpu.utils import load_yaml
from crank_tpu.utils.audio_io import write_wav
from crank_tpu.vocoder.train import (
    VocoderTrainer,
    aux_channels_for,
    aux_exts_for,
    concat_aux_features,
)

logging.basicConfig(level=logging.INFO, stream=sys.stdout)


def main():
    parser = argparse.ArgumentParser(description="Neural vocoder decode")
    parser.add_argument("--conf", type=str)
    parser.add_argument("--rootdir", type=str, help="decoded-feature h5 dir")
    parser.add_argument("--outdir", type=str)
    parser.add_argument("--expdir", type=str, help="vocoder experiment dir")
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument(
        "--gt",
        action="store_true",
        help="rootdir holds extraction h5s (ground-truth keys: mlfb / "
        "mcep+lcf0+uv) rather than decoded-feature dumps ('feats')",
    )
    args = parser.parse_args()

    conf = load_yaml(args.conf)
    voc_conf = conf.get("vocoder", {})
    voc_conf.setdefault("aux_channels", aux_channels_for(conf))
    ckpt = args.checkpoint or find_latest_checkpoint(args.expdir)
    assert ckpt, f"no vocoder checkpoint under {args.expdir}"
    if args.checkpoint:
        logging.info("decoding with explicit vocoder checkpoint %s", ckpt)
    else:
        # surface the default so a fine-tune regression can't hide: on
        # pseudo4 the +20k reconstruction fine-tune DEGRADED MCD by
        # 1.1-1.3 dB vs the pretrain-only checkpoint
        # (egs/vaevc/pseudo4/RESULTS.md round-3 table) — pass
        # --checkpoint (or run.py --voc_checkpoint) to pin a specific one
        logging.info(
            "decoding with LATEST vocoder checkpoint %s (the fine-tuned "
            "one if stage 6 ran the fine-tune phase; pin a different one "
            "with --checkpoint / run.py --voc_checkpoint if the "
            "fine-tune hurts objective MCD on your corpus)", ckpt,
        )
    state = load_checkpoint(ckpt)
    trainer = VocoderTrainer(voc_conf, args.expdir, resume_state=state)

    rootdir, outdir = Path(args.rootdir), Path(args.outdir)
    exts = aux_exts_for(conf, decoded=not args.gt)
    for h5f in sorted(rootdir.rglob("*.h5")):
        mel = concat_aux_features(h5f, exts)
        wav = trainer.decode_mel(mel)
        rel = h5f.relative_to(rootdir).parent
        (outdir / rel).mkdir(parents=True, exist_ok=True)
        out = outdir / rel / (h5f.stem + ".wav")
        write_wav(out, wav, conf["feature"]["fs"])
        logging.info("wrote %s", out)


if __name__ == "__main__":
    main()
