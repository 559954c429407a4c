"""Fused-op tests (Pallas kernels run in interpret mode on CPU)."""

import jax
import numpy as np

from crank_tpu.ops.vq_pallas import (
    _vq_fused_pallas,
    _vq_fused_xla,
    vq_fused_reference,
)


def test_vq_fused_xla_matches_reference():
    rng = np.random.default_rng(0)
    flat = rng.standard_normal((1000, 64)).astype(np.float32)
    cb = rng.standard_normal((512, 64)).astype(np.float32)
    ref = vq_fused_reference(flat, cb)
    out = jax.jit(_vq_fused_xla)(flat, cb)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(b), a, rtol=1e-4, atol=1e-3)


def test_vq_fused_pallas_interpret_matches_reference():
    rng = np.random.default_rng(1)
    # deliberately non-multiple of the tile size to exercise padding fixes
    flat = rng.standard_normal((1500, 64)).astype(np.float32)
    cb = rng.standard_normal((256, 64)).astype(np.float32)
    ref = vq_fused_reference(flat, cb)
    out = _vq_fused_pallas(flat, cb, interpret=True)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(b), a, rtol=1e-4, atol=1e-3)
