"""Mixed-precision (bf16) training-path validation.

``mixed_precision: bf16`` runs the generator's conv stacks in bfloat16 on
the MXU (params and optimizer state stay f32, outputs are cast back — see
crank_tpu/models/vqvae.py / models/wavenet.py ``dtype``).  These tests pin
what the flag must preserve before it can be recommended for production
TPU runs:

* the jitted vqvae step runs and all loss terms stay finite,
* single-batch overfit still converges (training dynamics survive the
  reduced precision),
* the bf16 forward tracks the f32 forward closely in eval mode (the
  deviation is precision noise, not a routing bug).

The reference has no mixed-precision story (torch f32 everywhere); this is
a TPU-native addition, benchmarked via CRANK_TPU_BENCH_BF16=1 in bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from crank_tpu.train.steps import Mode

from tests.test_convergence import _fixed_batch, _setup
from tests.test_train import make_conf


def _bf16_conf():
    conf = make_conf()
    conf["mixed_precision"] = "bf16"
    return conf


def test_bf16_step_runs_and_losses_finite():
    conf = _bf16_conf()
    factory, state = _setup(conf)
    batch = _fixed_batch(conf)
    step = factory.make_step(Mode(trainer_type="vqvae"))
    state, loss = step(state, batch, jax.random.PRNGKey(0))
    for name, val in loss.items():
        assert np.isfinite(float(val)), f"{name} not finite in bf16"
    # params must stay f32 (bf16 is compute-only)
    leaves = jax.tree_util.tree_leaves(state["params"]["G"])
    assert all(l.dtype == jnp.float32 for l in leaves)


def test_bf16_single_batch_overfit():
    # 250 steps (vs f32's 120): bf16 quantization noise makes the early VQ
    # codebook-settling commit spike (~step 110 on the 8-device mesh: seeded,
    # commit1 transiently ~6.0) recover more slowly; the trajectory then
    # converges steadily (observed 0.95 -> 0.55 by 250, 0.52 by 300).
    conf = _bf16_conf()
    conf["optim"]["G"]["lr"] = 5e-3
    factory, state = _setup(conf)
    batch = _fixed_batch(conf)
    step = factory.make_step(Mode(trainer_type="vqvae"))
    first = None
    key = jax.random.PRNGKey(42)
    for i in range(250):
        key, k = jax.random.split(key)
        state, loss = step(state, batch, k)
        if i == 0:
            first = float(loss["G_l1"])
    last = float(loss["G_l1"])
    assert last < 0.75 * first, f"no convergence in bf16: {first} -> {last}"


def test_bf16_forward_tracks_f32():
    conf_f32 = make_conf()
    conf_bf16 = _bf16_conf()
    factory32, state32 = _setup(conf_f32)
    factory16, _ = _setup(conf_bf16)
    batch = _fixed_batch(conf_f32)
    # same f32 params through both compute paths
    dec_h = jnp.concatenate(
        [jnp.asarray(batch["lcf0"]), jnp.asarray(batch["uv"])], axis=-1
    )
    spkrvec = jnp.asarray(batch["org_h"])
    outs = {}
    for name, factory in (("f32", factory32), ("bf16", factory16)):
        g = factory.models["G"]
        out = g.apply(
            {"params": state32["params"]["G"], "ema": state32["ema"]},
            jnp.asarray(batch["in_feats"]), None, dec_h, spkrvec,
        )
        outs[name] = np.asarray(out["decoded"][0], np.float32)
    ref = outs["f32"]
    scale = max(1.0, float(np.abs(ref).max()))
    err = float(np.abs(outs["bf16"] - ref).max()) / scale
    # bf16 has ~3 decimal digits; a deep stack accumulates to ~1e-1 worst
    # case relative error.  A routing bug (wrong branch, double-cast to
    # zero, NaN) lands orders of magnitude above this.
    assert err < 0.15, f"bf16 forward diverges from f32: rel err {err}"
    assert np.isfinite(outs["bf16"]).all()
