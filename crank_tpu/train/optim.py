"""Optimizer factories (optax).

Parity with the reference's per-model optimizer/scheduler config
(crank/net/trainer/utils.py:40-74): adam / radam / lamb with StepLR-style
staircase decay (lr * decay_size^(step // decay_step_size)) and optional
global-norm gradient clipping (clip inside the chain, matching
trainer_vqvae.py:200-208).
"""

import optax


def _schedule(lr, decay_step_size, decay_size):
    return optax.exponential_decay(
        init_value=lr,
        transition_steps=decay_step_size,
        decay_rate=decay_size,
        staircase=True,
    )


def make_optimizer(optim_conf):
    """optim_conf: {"type", "lr", "decay_size", "decay_step_size",
    "clip_grad_norm"} (one model's block of conf["optim"])."""
    sched = _schedule(
        optim_conf["lr"],
        optim_conf.get("decay_step_size", 200000),
        optim_conf.get("decay_size", 0.5),
    )
    kind = optim_conf.get("type", "adam")
    if kind == "adam":
        base = optax.adam(sched)
    elif kind == "radam":
        base = optax.radam(sched)
    elif kind == "lamb":
        base = optax.lamb(sched)
    else:
        raise ValueError(f"Invalid optimizer type: {kind}")
    clip = optim_conf.get("clip_grad_norm", 0.0) or 0.0
    if clip != 0.0:
        return optax.chain(optax.clip_by_global_norm(clip), base)
    return base


def make_optimizers(conf, model_names):
    return {m: make_optimizer(conf["optim"][m]) for m in model_names}
