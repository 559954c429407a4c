"""Optimizer-step parity vs the reference's torch optimizers.

The reference builds per-model torch optimizers + StepLR schedulers
(crank/net/trainer/utils.py:40-74) and steps every scheduler once per
*global* step (basetrainer).  These tests feed identical gradient
sequences to torch and to our optax chains (crank_tpu/train/optim.py) and
assert the parameter trajectories agree:

* adam (the reference's default type for every model) — exact trajectory,
  including the StepLR staircase and clip_grad_norm.
* radam — vs torch.optim.RAdam (torch_optimizer.RAdam, the reference's
  import, is not installed here; both implement Liu et al.'s Algorithm 2
  with the rho>5 rectification threshold).
* the D decay-clock offset: D's first update happens at global step
  n_steps_gan_start, but its StepLR has been stepping since step 0.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from crank_tpu.train.optim import (
    make_optimizer, schedule_gaps, step_offsets,
)

N_STEPS = 9
SHAPE = (4, 3)


def _grads(seed=0):
    rng = np.random.default_rng(seed)
    return [rng.standard_normal(SHAPE).astype(np.float32)
            for _ in range(N_STEPS)]


def _torch_traj(optim_cls, lr, step_size, gamma, grads, clip=0.0,
                start=0, **kw):
    """Parameter trajectory under the reference's update discipline:
    optional late start (GAN D), scheduler stepped every global step."""
    p = torch.nn.Parameter(torch.zeros(*SHAPE))
    opt = optim_cls([p], lr=lr, **kw)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=step_size,
                                            gamma=gamma)
    traj = []
    for t, g in enumerate(grads):
        if t >= start:
            opt.zero_grad()
            p.grad = torch.from_numpy(g)
            if clip:
                torch.nn.utils.clip_grad_norm_([p], clip)
            opt.step()
        sched.step()
        traj.append(p.detach().numpy().copy())
    return traj


def _optax_traj(optim_conf, grads, start=0):
    tx = make_optimizer(optim_conf, step_offset=start)
    p = jnp.zeros(SHAPE, jnp.float32)
    state = tx.init(p)
    traj = []
    for t, g in enumerate(grads):
        if t >= start:
            updates, state = tx.update(jnp.asarray(g), state, p)
            p = p + updates
        traj.append(np.asarray(p))
    return traj


def _assert_traj(tt, jt, tol, what):
    for t, (a, b) in enumerate(zip(tt, jt)):
        err = float(np.max(np.abs(a - b)))
        assert err < tol, f"{what}: step {t} max abs err {err} >= {tol}"


@pytest.mark.parametrize("clip", [0.0, 0.7])
def test_adam_steplr_parity(clip):
    """torch.optim.Adam + StepLR + clip_grad_norm_ vs our optax chain:
    identical parameter trajectory through two decay boundaries."""
    grads = _grads(1)
    tt = _torch_traj(torch.optim.Adam, 0.01, 3, 0.5, grads, clip=clip)
    jt = _optax_traj(
        {"type": "adam", "lr": 0.01, "decay_step_size": 3,
         "decay_size": 0.5, "clip_grad_norm": clip},
        grads,
    )
    _assert_traj(tt, jt, 1e-6, f"adam(clip={clip})")


def test_adam_late_start_offset_parity():
    """D's decay clock: torch steps StepLR from global step 0 while the
    optimizer only starts at n_steps_gan_start; our step_offset re-anchors
    the optax schedule to the same global clock."""
    grads = _grads(2)
    start = 4
    tt = _torch_traj(torch.optim.Adam, 0.02, 2, 0.5, grads, start=start)
    jt = _optax_traj(
        {"type": "adam", "lr": 0.02, "decay_step_size": 2,
         "decay_size": 0.5},
        grads, start=start,
    )
    _assert_traj(tt, jt, 1e-6, "adam late-start")
    # and without the offset the trajectories must diverge (regression
    # guard for the round-2 decay-clock deviation)
    jt_wrong = _optax_traj(
        {"type": "adam", "lr": 0.02, "decay_step_size": 2,
         "decay_size": 0.5},
        grads, start=0,
    )[: N_STEPS - start]
    final_err = float(np.max(np.abs(tt[-1] - jt_wrong[-1])))
    assert final_err > 1e-4


def test_radam_parity():
    """optax.radam vs torch.optim.RAdam (same rectification algorithm as
    the reference's torch_optimizer.RAdam import).  Tolerance is wider
    than adam's: the two differ only in where eps enters the denominator
    (constant ~8e-9/step in float64), which accumulates to ~1e-5 over a
    few float32 steps."""
    grads = _grads(3)
    tt = _torch_traj(torch.optim.RAdam, 0.01, 4, 0.5, grads)
    jt = _optax_traj(
        {"type": "radam", "lr": 0.01, "decay_step_size": 4,
         "decay_size": 0.5},
        grads,
    )
    _assert_traj(tt, jt, 2e-5, "radam")


def test_step_offsets_config():
    """Only GAN-family trainers offset D; vqvae (no D updates gated) and
    non-D models stay on the zero offset.  D's first update executes at
    global step n_steps_gan_start + 1 (gan_flag flips after the
    post-increment check, trainer._mode ≡ trainer_lsgan.py:184-185)."""
    conf = {"trainer_type": "lsgan", "n_steps_gan_start": 123}
    offs = step_offsets(conf, ["G", "D", "C", "SPKRADV"])
    assert offs == {"G": 0, "D": 124, "C": 0, "SPKRADV": 0}
    offs = step_offsets({"trainer_type": "vqvae"}, ["G", "C"])
    assert offs == {"G": 0, "C": 0}
    gaps = schedule_gaps(
        {"trainer_type": "lsgan", "n_steps_gan_start": 4,
         "n_steps_stop_generator": 3},
        ["G", "D", "C", "SPKRADV"],
    )
    assert gaps["G"] == (5, 3)
    assert gaps["D"] == (None, 0)
    # no freeze configured -> no gap
    gaps = schedule_gaps(
        {"trainer_type": "lsgan", "n_steps_gan_start": 4,
         "n_steps_stop_generator": 0}, ["G"],
    )
    assert gaps["G"] == (None, 0)


def _torch_gap_traj(lr, step_size, gamma, grads, freeze_at, freeze_len):
    """Reference discipline for G under stop-generator: updates at every
    global step EXCEPT t in [freeze_at, freeze_at+freeze_len); StepLR
    steps every global step regardless (trainer_lsgan.py:111 +
    basetrainer._step_update)."""
    p = torch.nn.Parameter(torch.zeros(*SHAPE))
    opt = torch.optim.Adam([p], lr=lr)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=step_size,
                                            gamma=gamma)
    traj = []
    for t, g in enumerate(grads):
        if not (freeze_at <= t < freeze_at + freeze_len):
            opt.zero_grad()
            p.grad = torch.from_numpy(g)
            opt.step()
        sched.step()
        traj.append(p.detach().numpy().copy())
    return traj


def test_adam_freeze_gap_parity():
    """G's decay clock across the stop-generator freeze: torch steps
    StepLR through the frozen window while the optimizer skips those
    updates; our gap_at/gap_len re-anchor the optax schedule so every
    post-freeze update sees the same LR epoch."""
    n = 12
    rng = np.random.default_rng(7)
    grads = [rng.standard_normal(SHAPE).astype(np.float32)
             for _ in range(n)]
    freeze_at, freeze_len = 3, 4
    tt = _torch_gap_traj(0.02, 2, 0.5, grads, freeze_at, freeze_len)

    tx = make_optimizer(
        {"type": "adam", "lr": 0.02, "decay_step_size": 2,
         "decay_size": 0.5},
        gap_at=freeze_at, gap_len=freeze_len,
    )
    p = jnp.zeros(SHAPE, jnp.float32)
    state = tx.init(p)
    jt = []
    for t, g in enumerate(grads):
        if not (freeze_at <= t < freeze_at + freeze_len):
            updates, state = tx.update(jnp.asarray(g), state, p)
            p = p + updates
        jt.append(np.asarray(p))
    _assert_traj(tt, jt, 1e-6, "adam freeze-gap")

    # without the gap the post-freeze trajectory must diverge (regression
    # guard for the round-2 "Known deviations" stop-generator corner)
    tx0 = make_optimizer(
        {"type": "adam", "lr": 0.02, "decay_step_size": 2,
         "decay_size": 0.5},
    )
    p0, s0 = jnp.zeros(SHAPE, jnp.float32), None
    s0 = tx0.init(p0)
    for t, g in enumerate(grads):
        if not (freeze_at <= t < freeze_at + freeze_len):
            updates, s0 = tx0.update(jnp.asarray(g), s0, p0)
            p0 = p0 + updates
    assert float(np.max(np.abs(np.asarray(p0) - tt[-1]))) > 1e-4


def test_trainer_gating_schedule_parity():
    """End-to-end clock check with the TRAINER's own gating formulas:
    over global steps 0..n-1 with n_steps_gan_start=gs and
    n_steps_stop_generator=stop, G updates whenever not
    (gan_flag and steps <= gs+stop), D updates whenever gan_flag
    (trainer._mode), and the reference steps every StepLR each global
    step.  make_optimizers' offsets/gaps must reproduce torch's LR
    epoch for every executed update."""
    from crank_tpu.train.optim import make_optimizers

    gs, stop, n, ss = 2, 3, 12, 2
    conf = {
        "trainer_type": "lsgan", "n_steps_gan_start": gs,
        "n_steps_stop_generator": stop,
        "optim": {
            m: {"type": "adam", "lr": 0.02, "decay_step_size": ss,
                "decay_size": 0.5} for m in ("G", "D")
        },
    }
    rng = np.random.default_rng(9)
    grads = [rng.standard_normal(SHAPE).astype(np.float32)
             for _ in range(n)]

    # torch side, reference discipline
    tp = {m: torch.nn.Parameter(torch.zeros(*SHAPE)) for m in ("G", "D")}
    topt = {m: torch.optim.Adam([tp[m]], lr=0.02) for m in tp}
    tsch = {m: torch.optim.lr_scheduler.StepLR(topt[m], step_size=ss,
                                               gamma=0.5) for m in tp}
    jtx = make_optimizers(conf, ["G", "D"])
    jp = {m: jnp.zeros(SHAPE, jnp.float32) for m in ("G", "D")}
    jst = {m: jtx[m].init(jp[m]) for m in jp}

    for t, g in enumerate(grads):
        gan_flag = t > gs
        stop_generator = gan_flag and stop > 0 and t <= gs + stop
        updates_now = {"G": not stop_generator, "D": gan_flag}
        for m in ("G", "D"):
            if updates_now[m]:
                topt[m].zero_grad()
                tp[m].grad = torch.from_numpy(g)
                topt[m].step()
                upd, jst[m] = jtx[m].update(jnp.asarray(g), jst[m], jp[m])
                jp[m] = jp[m] + upd
            tsch[m].step()
        for m in ("G", "D"):
            err = float(np.max(np.abs(
                tp[m].detach().numpy() - np.asarray(jp[m])
            )))
            assert err < 1e-6, f"{m} diverged at global step {t}: {err}"


def test_warmstart_sched_anchors_clock():
    """Warm-starting a pretrain checkpoint at step S under a GAN conf:
    the trainer's global-step gating (trainer.py:113-127) makes D's first
    update and the stop-generator window depend on S, so the conf-derived
    anchors are wrong whenever S > n_steps_gan_start (VERDICT r3 review
    finding).  warmstart_sched_anchors must map every executed update's
    optax count back to its true global step (eff == t) for any S."""
    from crank_tpu.train.optim import (
        default_sched_anchors, warmstart_sched_anchors,
    )

    gs, stop, n = 5, 3, 20
    conf = {"trainer_type": "lsgan", "n_steps_gan_start": gs,
            "n_steps_stop_generator": stop}

    def eff(count, anchor):
        e = count + anchor["step_offset"]
        if anchor["gap_at"] is not None and anchor["gap_len"]:
            e += anchor["gap_len"] * (count >= anchor["gap_at"])
        return e

    for S in (2, gs, gs + 1, gs + 2, gs + stop, gs + stop + 4):
        anchors = warmstart_sched_anchors(conf, ["G", "D"], S, ["D"])
        # pretrain updated G at steps 0..S (checkpoint label = last
        # executed step; trainer resumes at steps = S + 1)
        counts = {"G": S + 1, "D": 0}
        for t in range(S + 1, n):
            gan_flag = t > gs
            stop_generator = gan_flag and t <= gs + stop
            if not stop_generator:  # G updates
                assert eff(counts["G"], anchors["G"]) == t, (
                    f"G eff mismatch at t={t}, S={S}")
                counts["G"] += 1
            if gan_flag:  # D updates
                assert eff(counts["D"], anchors["D"]) == t, (
                    f"D eff mismatch at t={t}, S={S}")
                counts["D"] += 1

    # a pre-GAN warm start is the continuous timeline: anchors must
    # reduce to the conf-derived defaults
    assert (warmstart_sched_anchors(conf, ["G", "D"], 2, ["D"])
            == default_sched_anchors(conf, ["G", "D"]))
    # non-GAN confs are untouched
    vq = {"trainer_type": "vqvae"}
    assert (warmstart_sched_anchors(vq, ["G"], 7, [])
            == default_sched_anchors(vq, ["G"]))
