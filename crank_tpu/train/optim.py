"""Optimizer factories (optax).

Parity with the reference's per-model optimizer/scheduler config
(crank/net/trainer/utils.py:40-74): adam / radam / lamb with StepLR-style
staircase decay (lr * decay_size^(step // decay_step_size)) and optional
global-norm gradient clipping (clip inside the chain, matching
trainer_vqvae.py:200-208).

Decay-clock parity: the reference steps every model's StepLR once per
*global* training step (basetrainer), while optax schedules count that
model's *updates*.  For models whose updates start late (D begins at
``n_steps_gan_start``) the two clocks would diverge whenever
``decay_step_size < n_steps``; ``step_offset`` re-anchors the schedule to
the global-step clock (update count + offset == 0-based global step).
"""

import optax


def _schedule(lr, decay_step_size, decay_size, step_offset=0):
    """StepLR staircase on the global-step clock.

    lr(count) = lr * decay_size ** ((count + step_offset) // decay_step_size)
    """

    def sched(count):
        return lr * decay_size ** ((count + step_offset) // decay_step_size)

    return sched


def make_optimizer(optim_conf, step_offset=0):
    """optim_conf: {"type", "lr", "decay_size", "decay_step_size",
    "clip_grad_norm"} (one model's block of conf["optim"])."""
    sched = _schedule(
        optim_conf["lr"],
        optim_conf.get("decay_step_size", 200000),
        optim_conf.get("decay_size", 0.5),
        step_offset,
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


def step_offsets(conf, model_names):
    """Per-model global-step offsets: D's first update happens at global
    step n_steps_gan_start (trainer_lsgan.py:183-192), so its schedule is
    shifted to keep StepLR parity with the reference's global clock.
    G/C/SPKRADV update from step 0 (offset 0)."""
    offsets = {m: 0 for m in model_names}
    if "D" in offsets and conf.get("trainer_type") in (
        "lsgan", "cyclegan", "stargan"
    ):
        offsets["D"] = int(conf.get("n_steps_gan_start", 0))
    return offsets


def make_optimizers(conf, model_names):
    offs = step_offsets(conf, model_names)
    return {
        m: make_optimizer(conf["optim"][m], offs[m]) for m in model_names
    }
