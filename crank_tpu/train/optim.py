"""Optimizer factories (optax).

Parity with the reference's per-model optimizer/scheduler config
(crank/net/trainer/utils.py:40-74): adam / radam / lamb with StepLR-style
staircase decay (lr * decay_size^(step // decay_step_size)) and optional
global-norm gradient clipping (clip inside the chain, matching
trainer_vqvae.py:200-208).

Decay-clock parity: the reference steps every model's StepLR once per
*global* training step (basetrainer._step_update:239-247), while optax
schedules count that model's *updates*.  Two cases diverge whenever
``decay_step_size < n_steps``:

* late start — D's first update happens at global step
  ``n_steps_gan_start + 1`` (gan_flag flips after the post-increment
  check, trainer_lsgan.py:184-185 ≡ trainer._mode) but its StepLR has
  been stepping since step 0; ``step_offset`` re-anchors the schedule
  (update count + offset == 0-based global step).
* update gap — G skips its updates during the stop-generator window
  (global steps gan_start+1 .. gan_start+stop, trainer_lsgan.py:111)
  while its StepLR keeps stepping; ``gap_at``/``gap_len`` add the
  skipped steps back once the count passes the freeze point.
"""

import optax


def _schedule(lr, decay_step_size, decay_size, step_offset=0,
              gap_at=None, gap_len=0):
    """StepLR staircase on the global-step clock.

    lr(count) = lr * decay_size ** (eff // decay_step_size) with
    eff = count + step_offset + gap_len * (count >= gap_at): the model's
    update count mapped back to the 0-based global step it executes at.
    """

    def sched(count):
        eff = count + step_offset
        if gap_at is not None and gap_len:
            eff = eff + gap_len * (count >= gap_at)
        return lr * decay_size ** (eff // decay_step_size)

    return sched


def make_optimizer(optim_conf, step_offset=0, gap_at=None, gap_len=0):
    """optim_conf: {"type", "lr", "decay_size", "decay_step_size",
    "clip_grad_norm"} (one model's block of conf["optim"])."""
    sched = _schedule(
        optim_conf["lr"],
        optim_conf.get("decay_step_size", 200000),
        optim_conf.get("decay_size", 0.5),
        step_offset,
        gap_at,
        gap_len,
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


_GAN_TRAINERS = ("lsgan", "cyclegan", "stargan")


def step_offsets(conf, model_names):
    """Per-model global-step offsets: D's first update happens at global
    step n_steps_gan_start + 1 (gan_flag flips after the post-increment
    step check, trainer_lsgan.py:183-192 ≡ trainer._mode), so its
    schedule is shifted to keep StepLR parity with the reference's
    global clock.  G/C/SPKRADV update from step 0 (offset 0)."""
    offsets = {m: 0 for m in model_names}
    if "D" in offsets and conf.get("trainer_type") in _GAN_TRAINERS:
        offsets["D"] = int(conf.get("n_steps_gan_start", 0)) + 1
    return offsets


def schedule_gaps(conf, model_names):
    """Per-model (gap_at, gap_len): G skips its updates during the
    stop-generator window (global steps gan_start+1 .. gan_start+stop,
    trainer_lsgan.py:111,186-192) while the reference steps its StepLR
    anyway — G's count reaches gan_start+1 right when the freeze begins,
    and every later update executes gap_len global steps later than its
    count says."""
    gaps = {m: (None, 0) for m in model_names}
    stop = int(conf.get("n_steps_stop_generator", 0) or 0)
    if stop and "G" in gaps and conf.get("trainer_type") in _GAN_TRAINERS:
        gaps["G"] = (int(conf.get("n_steps_gan_start", 0)) + 1, stop)
    return gaps


def default_sched_anchors(conf, model_names):
    """Conf-derived StepLR anchors, valid for a run that trains the whole
    timeline (pretrain + GAN phase) in one conf — the reference's only
    supported shape."""
    offs = step_offsets(conf, model_names)
    gaps = schedule_gaps(conf, model_names)
    return {
        m: {"step_offset": offs[m], "gap_at": gaps[m][0],
            "gap_len": gaps[m][1]}
        for m in model_names
    }


def warmstart_sched_anchors(conf, model_names, resume, missing):
    """Anchors for warm-starting a non-GAN pretrain checkpoint at global
    step ``resume`` under a GAN conf (the fresh-init-missing-sub-models
    path in bin/train.py).

    The conf-derived anchors assume the GAN phase begins exactly at
    ``n_steps_gan_start``; with ``resume > gan_start`` the trainer's
    global-step gating (trainer.py:113-121) starts D at ``resume + 1``
    and shrinks (or skips) the stop-generator window, so the anchors are
    re-derived from the actual timeline.  Valid because the pretrain
    updated G every step (its optax count == resume).  The result is
    persisted in checkpoints so later relaunches keep the same clock.
    """
    anchors = default_sched_anchors(conf, model_names)
    if conf.get("trainer_type") not in _GAN_TRAINERS:
        return anchors
    gan_start = int(conf.get("n_steps_gan_start", 0))
    stop = int(conf.get("n_steps_stop_generator", 0) or 0)
    if "D" in missing and "D" in anchors:
        anchors["D"]["step_offset"] = max(gan_start, int(resume)) + 1
    if stop and "G" in anchors:
        # the freeze window covers global steps gan_start+1..gan_start+stop;
        # only the part after `resume` is actually skipped going forward
        freeze_begin = max(gan_start, int(resume))  # G's count at freeze
        skipped = max(0, gan_start + stop - freeze_begin)
        if skipped == 0:
            anchors["G"].update(gap_at=None, gap_len=0)
        else:
            anchors["G"].update(gap_at=freeze_begin + 1, gap_len=skipped)
    return anchors


def make_optimizers(conf, model_names, sched_anchors=None):
    if sched_anchors is None:
        sched_anchors = default_sched_anchors(conf, model_names)
    return {
        m: make_optimizer(
            conf["optim"][m],
            sched_anchors[m]["step_offset"],
            sched_anchors[m]["gap_at"],
            sched_anchors[m]["gap_len"],
        )
        for m in model_names
    }
