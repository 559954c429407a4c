#!/usr/bin/env python
"""Training-step cost ablation at production geometry.

Times the jitted `vqvae` step under component/precision ablations so the
throughput headline (bench.py) can be decomposed:

  full        G + SPKRADV + C updates, f32 (the bench.py workload)
  g_only      G update only (spkradv/classifier off)
  bf16        full step with the generator's conv stacks in bfloat16
  g_only_bf16 both ablations

Prints one JSON line per variant: frames/sec/chip, per-device
cost-analysis FLOPs, and MFU where the chip peak is known.  Run on the
TPU; on CPU it still works for plumbing checks (CRANK_TPU_BENCH_SMOKE=1
shrinks geometry).
"""

import json
import os
import sys
import time
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SMOKE = bool(int(os.environ.get("CRANK_TPU_BENCH_SMOKE", "0")))

def bench_variant(name, conf_overrides, mode_kwargs=None):
    from crank_tpu.configs import default_conf
    from crank_tpu.parallel.mesh import get_mesh, replicate, shard_batch
    from crank_tpu.train.factory import build_models, init_models
    from crank_tpu.train.optim import make_optimizers
    from crank_tpu.train.steps import Mode, StepFactory
    from crank_tpu.utils.benchutil import make_synthetic_batch, peak_bf16_flops

    spkr_size = 4
    conf = default_conf(**conf_overrides)
    B, T, D = conf["batch_size"], conf["batch_len"], conf["input_size"]
    if SMOKE:
        B, T = 4, 64
    mesh = get_mesh()
    n_chips = mesh.shape["data"]
    B = B * n_chips

    models = build_models(conf, spkr_size)
    params, ema = init_models(models, conf, spkr_size, jax.random.PRNGKey(0),
                              B=2, T=T)
    opts = make_optimizers(conf, list(models.keys()))
    state = {"params": params, "ema": ema,
             "opt": {m: opts[m].init(params[m]) for m in models}}
    state = {k: replicate(v, mesh) for k, v in state.items()}

    batch = make_synthetic_batch(
        np.random.default_rng(0), B, T, D, spkr_size
    )
    batch = shard_batch(batch, mesh)

    factory = StepFactory(conf, models, opts, spkr_size=spkr_size)
    step = factory.make_step(
        Mode(**({"trainer_type": "vqvae"} if mode_kwargs is None
                else mode_kwargs))
    )
    key = jax.random.PRNGKey(1)

    flops = None
    try:
        compiled = step.lower(state, batch, key).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca["flops"])
        step = compiled
    except Exception:
        pass

    for _ in range(2):
        key, k = jax.random.split(key)
        state, loss = step(state, batch, k)
    jax.block_until_ready(loss["G"])

    n_iters = 2 if SMOKE else 10
    n_windows = 1 if SMOKE else 3
    best = float("inf")
    for w in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            key, k = jax.random.split(key)
            state, loss = step(state, batch, k)
        jax.block_until_ready(loss["G"])
        best = min(best, time.perf_counter() - t0)
        if w < n_windows - 1:
            time.sleep(10)

    fps = B * T * n_iters / best / n_chips
    peak = peak_bf16_flops(jax.devices()[0])
    mfu = flops * n_iters / best / peak if (flops and peak) else None
    print(json.dumps({
        "variant": name,
        "frames_per_sec_per_chip": round(fps, 1),
        "step_ms": round(best / n_iters * 1e3, 2),
        "flops_per_step_per_device": flops,
        "mfu": round(mfu, 4) if mfu is not None else None,
        "device": jax.devices()[0].device_kind,
    }), flush=True)


def main():
    variants = [
        ("full", {}, None),
        ("g_only", {"use_spkradv_training": False,
                    "use_spkr_classifier": False}, None),
        ("bf16", {"mixed_precision": "bf16"}, None),
        ("g_only_bf16", {"use_spkradv_training": False,
                         "use_spkr_classifier": False,
                         "mixed_precision": "bf16"}, None),
        # the reference flagship schedule's other two phases
        # (template/conf/default.yml: cycle at 50k, gan at 100k of 200k;
        # phases are mutually exclusive — trainer_lsgan.py:60-67)
        ("cycle", {"use_cyclic_training": True},
         {"trainer_type": "vqvae", "cycle_flag": True}),
        ("gan", {"trainer_type": "lsgan"},
         {"trainer_type": "lsgan", "gan_flag": True}),
        # stargan: cycle_forward-based G update + switch_update-gated D
        # (reference trainer_stargan.py:51-118)
        ("stargan", {"trainer_type": "stargan"},
         {"trainer_type": "stargan", "gan_flag": True}),
        # the flagship mlfb_cycle schedule's steady state past 100k:
        # cycle AND gan terms in one step (the largest program the
        # production run compiles; also serves as the cache pre-warm for
        # the 100k flip — see RESULTS.md round-4/5 notes)
        ("gan_cycle", {"trainer_type": "lsgan",
                       "use_cyclic_training": True},
         {"trainer_type": "lsgan", "gan_flag": True, "cycle_flag": True}),
    ]
    # each variant's precision comes from its conf override; a stray
    # CRANK_TPU_MIXED_PRECISION in the shell would take precedence inside
    # VQVAE2Config.from_conf and silently run ALL variants at that
    # precision while the JSON labels them as f32 baselines
    if os.environ.pop("CRANK_TPU_MIXED_PRECISION", None) is not None:
        print(json.dumps({"warning": "CRANK_TPU_MIXED_PRECISION ignored: "
                          "the ablation sets precision per variant"}),
              flush=True)
    only = os.environ.get("CRANK_TPU_ABLATION_ONLY")
    for name, overrides, mode_kwargs in variants:
        if only and name != only:
            continue
        os.environ["CRANK_TPU_MIXED_PRECISION"] = overrides.get(
            "mixed_precision", "none")
        try:
            bench_variant(name, overrides, mode_kwargs)
        finally:
            del os.environ["CRANK_TPU_MIXED_PRECISION"]


if __name__ == "__main__":
    main()
