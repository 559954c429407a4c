#!/usr/bin/env python
"""Cross-framework end-to-end training-parity experiment driver.

Trains the REFERENCE's own trainer stack (torch, CPU; the GPU assert at
/root/reference/crank/bin/train.py:158-159 is bypassed by calling the same
factories main() calls — get_model / get_optimizer / get_criterion /
get_dataloader / get_scheduler / TrainerWrapper — with device="cpu") and
crank_tpu on the IDENTICAL pseudo4 features, splits, scaler, and merged
conf, then transfers the reference-trained torch weights into a crank_tpu
checkpoint so BOTH models decode through the numerically identical
stage-4/5/6/7 chain.  Everything the per-step parity tests cannot see —
loader shuffling/crop RNG, scaler application, f0-statistics conversion,
training-set composition (the reference trains on train+dev,
crank/net/trainer/utils.py:86-89), schedule bookkeeping — is exercised by
the full loops and lands in the final MCD comparison.

Procedure (see docs/TRAIN_PARITY.md for results):
  cd egs/vaevc/pseudo4
  # 1. reference side: torch-CPU training + loss history
  python ../../../tools/xfw_train_parity.py ref-train \
      --recipe . --conf conf/xfw_vqvae.yml --tag xfw_ref_torch
  # 2. transfer the torch checkpoint into a crank_tpu checkpoint
  python ../../../tools/xfw_train_parity.py transfer \
      --recipe . --conf conf/xfw_ref.yml --tag xfw_ref_torch
  # 3. crank_tpu side + identical eval chain for both
  python -m crank_tpu.bin.run --recipe . --conf conf/xfw_vqvae.yml --stage 3 --stop_stage 3
  python -m crank_tpu.bin.run --recipe . --conf conf/xfw_vqvae.yml --stage 5 --stop_stage 7
  python -m crank_tpu.bin.run --recipe . --conf conf/xfw_ref.yml   --stage 5 --stop_stage 7
  # 4. compare
  python ../../../tools/xfw_train_parity.py summarize --recipe . \
      --ours xfw_vqvae --ref xfw_ref
"""

import argparse
import json
import logging
import random
import re
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s xfw %(levelname)s: %(message)s")


def _merged_conf(recipe, conf_rel):
    from crank_tpu.utils import load_yaml

    return load_yaml(Path(recipe) / conf_rel,
                     default_ymlf=Path(recipe) / "conf" / "default.yml")


class _F32Scaler:
    """Dtype-preserving transform wrapper.

    sklearn's StandardScaler.transform keeps float32 inputs float32 (its
    in-place `X -= mean_` never promotes), which is what the reference's
    production pipeline relied on; crank_tpu's first-party scaler computes
    `(X - mean_) / scale_`, which numpy promotes to float64.  The wrapper
    restores the sklearn semantics so the reference's torch collate
    produces FloatTensors.
    """

    def __init__(self, inner):
        self._inner = inner

    def transform(self, X):
        X = np.asarray(X)
        return self._inner.transform(X).astype(X.dtype, copy=False)

    def inverse_transform(self, X):
        X = np.asarray(X)
        return self._inner.inverse_transform(X).astype(X.dtype, copy=False)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def _wrap_scaler(scaler):
    return {
        k: ({k2: _F32Scaler(v2) for k2, v2 in v.items()}
            if isinstance(v, dict) else _F32Scaler(v))
        for k, v in scaler.items()
    }


def _load_scp(recipe, conf):
    from crank.utils import open_featsscp, open_scpdir

    recipe = Path(recipe)
    featdir = recipe / "data" / "feature" / conf["feature"]["label"]
    scp = {}
    for phase in ("train", "dev", "eval"):
        scp[phase] = open_scpdir(recipe / "data" / "scp" / phase)
        scp[phase]["feats"] = open_featsscp(featdir / phase / "feats.scp")
    return scp, featdir


def ref_train(args):
    # numpy>=2 removed the np.long alias the reference dataset uses
    # (crank/net/trainer/dataset.py:155)
    if not hasattr(np, "long"):
        np.long = np.int64

    import joblib
    import torch
    from refparity import refenv

    refenv.load_reference()
    from crank.bin.train import get_model
    from crank.net.trainer.basetrainer import TrainerWrapper
    from crank.net.trainer.utils import (
        get_criterion,
        get_dataloader,
        get_optimizer,
        get_scheduler,
    )
    from tensorboardX import SummaryWriter

    recipe = Path(args.recipe).resolve()
    conf = _merged_conf(recipe, args.conf)
    if args.n_steps:
        conf["n_steps"] = args.n_steps

    # mirror the reference entry's seeding (crank/bin/train.py:49-52);
    # --seed varies it for the seed-variance error bar (VERDICT r4 weak #5)
    seed = getattr(args, "seed", 1234)
    random.seed(seed)
    np.random.seed(seed)
    torch.manual_seed(seed)

    scp, featdir = _load_scp(recipe, conf)
    expdir = recipe / "exp" / args.tag
    expdir.mkdir(parents=True, exist_ok=True)
    spkr_size = len(scp["train"]["spkrs"])
    scaler = _wrap_scaler(joblib.load(featdir / "scaler.pkl"))

    model = get_model(conf, spkr_size, "cpu", scaler=scaler)
    conf["encoder_receptive_size"] = model["G"].encoder_receptive_size
    conf["decoder_receptive_size"] = model["G"].decoder_receptive_size
    optimizer = get_optimizer(conf, model)
    criterion = get_criterion(conf, device="cpu")
    dataloader = get_dataloader(conf, scp, scaler, n_jobs=0, flag="train")
    scheduler = get_scheduler(conf, optimizer)
    writer = {
        "train": SummaryWriter(logdir=str(expdir / "runs" / "train")),
        "dev": SummaryWriter(logdir=str(expdir / "runs" / "dev")),
    }
    trainer = TrainerWrapper(
        conf["trainer_type"],
        model=model,
        optimizer=optimizer,
        criterion=criterion,
        dataloader=dataloader,
        writer=writer,
        expdir=expdir,
        conf=conf,
        feat_conf=conf["feature"],
        scheduler=scheduler,
        scaler=scaler,
        resume=0,
        device="cpu",
        n_jobs=0,
    )

    hist_path = expdir / "loss_history.jsonl"
    hist = open(hist_path, "w")
    orig_train = trainer.train

    def train_logged(batch, phase="train"):
        lv = orig_train(batch, phase=phase)
        if phase == "train":
            hist.write(json.dumps(
                {"step": trainer.steps,
                 **{k: float(v) for k, v in lv.items()}}) + "\n")
            hist.flush()
        return lv

    trainer.train = train_logged
    logging.info("reference torch-CPU training: %d steps into %s",
                 conf["n_steps"], expdir)
    trainer.run(flag="train")
    hist.close()
    logging.info("done; loss history at %s", hist_path)


def transfer(args):
    if not hasattr(np, "long"):
        np.long = np.int64

    import joblib
    import torch
    from refparity import refenv, transfer as xfer

    refenv.load_reference()
    from crank.bin.train import get_model

    import jax

    from crank_tpu.train.checkpoint import save_checkpoint
    from crank_tpu.train.factory import build_models, init_models
    from crank_tpu.train.optim import make_optimizers

    recipe = Path(args.recipe).resolve()
    conf = _merged_conf(recipe, args.conf)
    scp, featdir = _load_scp(recipe, conf)
    spkr_size = len(scp["train"]["spkrs"])
    scaler = _wrap_scaler(joblib.load(featdir / "scaler.pkl"))

    torch_expdir = recipe / "exp" / args.tag
    pkls = sorted(torch_expdir.glob("checkpoint_*steps.pkl"),
                  key=lambda p: int(re.findall(r"\d+", p.stem)[0]))
    assert pkls, f"no torch checkpoint under {torch_expdir}"
    ckpt = pkls[-1]
    steps = int(re.findall(r"\d+", ckpt.stem)[0])
    logging.info("transferring %s (steps=%d)", ckpt, steps)

    ref_models = get_model(conf, spkr_size, "cpu", scaler=scaler)
    state_dict = torch.load(ckpt, map_location="cpu", weights_only=False)
    for m, mod in ref_models.items():
        mod.load_state_dict(state_dict["model"][m])
        mod.eval()

    models = build_models(conf, spkr_size)
    params, _ = init_models(models, conf, spkr_size, jax.random.PRNGKey(0),
                            B=2, T=conf["batch_len"])
    gvars = {"params": params["G"]}
    # template ema collection from a fresh init of G alone
    import jax.numpy as jnp

    from crank_tpu.models.vqvae import VQVAE2, VQVAE2Config

    g = VQVAE2(VQVAE2Config.from_conf(conf, spkr_size))
    x = jnp.zeros((2, conf["batch_len"], conf["input_size"]), jnp.float32)
    dec_h = jnp.zeros((2, conf["batch_len"], 2), jnp.float32)
    spkrvec = jnp.zeros((2, conf["batch_len"]), jnp.int32)
    enc_h = dec_h if conf["encoder_f0"] else None
    g_init = g.init(jax.random.PRNGKey(0), x, enc_h, dec_h, spkrvec)
    gvars = {"params": g_init["params"], "ema": g_init["ema"]}
    gvars = xfer.vqvae2_to_flax(ref_models["G"], gvars)
    params["G"] = gvars["params"]
    ema = gvars["ema"]
    if "SPKRADV" in ref_models and "SPKRADV" in params:
        v = xfer.module_to_flax(
            xfer.pwg_discriminator_to_flax, ref_models["SPKRADV"].classifier,
            {"params": params["SPKRADV"]}, prefix=("ConvDiscriminator_0",),
        )
        params["SPKRADV"] = v["params"]
    if "C" in ref_models and "C" in params:
        v = xfer.module_to_flax(
            xfer.pwg_discriminator_to_flax, ref_models["C"],
            {"params": params["C"]},
        )
        params["C"] = v["params"]
    if "D" in ref_models and "D" in params:
        # adversarial trainers (lsgan/cyclegan/stargan xfw slices): the
        # reference's D is (Residual)ParallelWaveGANDiscriminator
        # (crank/bin/train.py:108-128), mapped by the same helpers the
        # per-step parity tests use
        mapper = (xfer.pwg_residual_discriminator_to_flax
                  if conf["use_residual_network"]
                  else xfer.pwg_discriminator_to_flax)
        v = xfer.module_to_flax(mapper, ref_models["D"],
                                {"params": params["D"]})
        params["D"] = v["params"]

    opts = make_optimizers(conf, list(models.keys()))
    out_expdir = recipe / "exp" / args.out
    out_expdir.mkdir(parents=True, exist_ok=True)
    payload = {
        "steps": steps,
        "params": params,
        "ema": ema,
        "opt": {m: opts[m].init(params[m]) for m in models},
        "rng": jax.random.PRNGKey(steps),
    }
    path = save_checkpoint(out_expdir, payload)
    logging.info("wrote crank_tpu checkpoint: %s", path)


def _parse_our_losses(expdir):
    """Parse crank_tpu train logs (train.log + watchdog segments
    train.seg*.log, in order) into [{step, G, ...}] records."""
    logs = sorted(Path(expdir).glob("train*.log"),
                  key=lambda p: (len(p.stem), p.stem))
    text = "".join(p.read_text() for p in logs)
    hist, cur = [], None
    pat_iter = re.compile(r"train iterations: (\d+)")
    pat_loss = re.compile(r"INFO: ([A-Za-z0-9_]+): (-?[0-9.]+(?:e-?\d+)?)$")
    for line in text.splitlines():
        m = pat_iter.search(line)
        if m:
            if cur:
                hist.append(cur)
            cur = {"step": int(m.group(1))}
            continue
        if cur is not None:
            m = pat_loss.search(line)
            if m:
                cur[m.group(1)] = float(m.group(2))
    if cur:
        hist.append(cur)
    return hist


def _parse_mcd_log(mcd_log):
    """Parse an evaluate_mcd summary log ("ORG TGT mcd" lines) into
    {(org, tgt): mcd}."""
    out = {}
    for line in Path(mcd_log).read_text().strip().splitlines():
        parts = line.split()
        if len(parts) >= 3:
            try:
                val = float(parts[-1])
            except ValueError:
                continue
            out[(parts[0], parts[1])] = val
    return out


def summarize(args):
    recipe = Path(args.recipe).resolve()
    ours_dir = recipe / "exp" / args.ours
    ref_dir = recipe / "exp" / args.ref

    report = {"ours": args.ours, "ref": args.ref}

    # --- MCD tables (same eval chain for both)
    def mcd_table(expdir):
        logs = sorted(expdir.glob("eval_*_wav/*/mcd.log"))
        assert logs, f"no mcd.log under {expdir}"
        return _parse_mcd_log(logs[-1]), logs[-1]

    ours_mcd, ours_log = mcd_table(ours_dir)
    ref_mcd, ref_log = mcd_table(ref_dir)
    assert set(ours_mcd) == set(ref_mcd), (
        f"pair sets differ: {set(ours_mcd) ^ set(ref_mcd)}")

    def split_pairs(table):
        cross = [v for (org, tgt), v in table.items()
                 if org != tgt and not np.isnan(v)]
        self_ = [v for (org, tgt), v in table.items()
                 if org == tgt and not np.isnan(v)]
        return float(np.mean(cross)), float(np.mean(self_))

    ours_cross, ours_self = split_pairs(ours_mcd)
    ref_cross, ref_self = split_pairs(ref_mcd)
    report["mcd"] = {
        "ours": {"cross": round(ours_cross, 3), "self": round(ours_self, 3),
                 "log": str(ours_log)},
        "ref": {"cross": round(ref_cross, 3), "self": round(ref_self, 3),
                "log": str(ref_log)},
        "delta_cross": round(ours_cross - ref_cross, 3),
        "delta_self": round(ours_self - ref_self, 3),
        "per_pair_delta": {
            f"{org}-{tgt}": round(ours_mcd[(org, tgt)] - ref_mcd[(org, tgt)], 3)
            for org, tgt in sorted(ours_mcd)
        },
    }

    # --- loss curves
    ref_hist_f = ref_dir.parent / args.ref_tag / "loss_history.jsonl"
    if ref_hist_f.exists() and list(ours_dir.glob("train*.log")):
        ref_hist = [json.loads(x) for x in
                    ref_hist_f.read_text().splitlines()]
        our_hist = _parse_our_losses(ours_dir)
        ref_by_step = {h["step"]: h for h in ref_hist}
        window = []
        for h in our_hist:
            r = ref_by_step.get(h["step"])
            if r and "G" in h and "G" in r:
                window.append((h["step"], h["G"], r["G"]))
        if window:
            tail = window[-max(1, len(window) // 5):]
            report["loss"] = {
                "n_matched_steps": len(window),
                "final_window": {
                    "ours_G_mean": round(float(np.mean([w[1] for w in tail])), 4),
                    "ref_G_mean": round(float(np.mean([w[2] for w in tail])), 4),
                },
                "curve": [
                    {"step": s, "ours_G": round(o, 4), "ref_G": round(r, 4)}
                    for s, o, r in window[:: max(1, len(window) // 20)]
                ],
            }

    out = recipe / "exp" / "xfw_summary.json"
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))
    logging.info("summary written to %s", out)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("ref-train")
    q.add_argument("--recipe", required=True)
    q.add_argument("--conf", default="conf/xfw_vqvae.yml")
    q.add_argument("--tag", default="xfw_ref_torch")
    q.add_argument("--n_steps", type=int, default=None)
    q.add_argument("--seed", type=int, default=1234,
                   help="replaces the reference entry's fixed 1234 seeding "
                        "(crank/bin/train.py:49-52) for seed-variance runs")
    q.set_defaults(fn=ref_train)

    q = sub.add_parser("transfer")
    q.add_argument("--recipe", required=True)
    q.add_argument("--conf", default="conf/xfw_ref.yml")
    q.add_argument("--tag", default="xfw_ref_torch")
    q.add_argument("--out", default="xfw_ref")
    q.set_defaults(fn=transfer)

    q = sub.add_parser("summarize")
    q.add_argument("--recipe", required=True)
    q.add_argument("--ours", default="xfw_vqvae")
    q.add_argument("--ref", default="xfw_ref")
    q.add_argument("--ref_tag", default="xfw_ref_torch")
    q.set_defaults(fn=summarize)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
