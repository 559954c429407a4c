"""Shared scaffolding for the benchmark/dryrun tools.

bench.py, benchmarks/step_ablation.py and __graft_entry__.py all need the
same two pieces: the chip peak-FLOPs table for MFU and a synthetic train
batch matching the loader's key/dtype contract (crank_tpu/train/dataset.py).
Keeping them here prevents the three copies from drifting (a new chip or a
new batch key must be added exactly once).
"""

import numpy as np

# peak dense bf16 matmul throughput per chip (public spec sheets)
PEAK_BF16_FLOPS = {
    "v5 lite": 197e12,   # TPU v5e
    "v5e": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v6": 918e12,        # Trillium
    "v6e": 918e12,
}


def peak_bf16_flops(device):
    """Peak dense bf16 FLOPs/s for a jax device, or None if unknown."""
    kind = device.device_kind.lower()
    for key, val in PEAK_BF16_FLOPS.items():
        if key in kind:
            return val
    return None


def make_synthetic_batch(rng, B, T, dim, spkr_size, label_padding=0):
    """Synthetic train batch with the loader's exact key/dtype contract.

    ``label_padding`` marks that many trailing frames of ``org_h`` with
    IGNORE_INDEX, like real ragged batches (classifier CE must mask them).
    """
    from crank_tpu.train.dataset import IGNORE_INDEX

    feats = rng.standard_normal((B, T, dim)).astype(np.float32)
    ones_m = np.ones((B, T, 1), bool)
    oh = np.eye(spkr_size, dtype=np.float32)
    batch = {
        "in_feats": feats,
        "out_feats": feats.copy(),
        "lcf0": rng.standard_normal((B, T, 1)).astype(np.float32),
        "uv": (rng.random((B, T, 1)) > 0.3).astype(np.float32),
        "cv_lcf0": rng.standard_normal((B, T, 1)).astype(np.float32),
        "org_h": np.tile(rng.integers(0, spkr_size, (B, 1)), (1, T)),
        "cv_h": np.tile(rng.integers(0, spkr_size, (B, 1)), (1, T)),
        "org_h_onehot": oh[rng.integers(0, spkr_size, B)][:, None, :]
        .repeat(T, axis=1),
        "cv_h_onehot": oh[rng.integers(0, spkr_size, B)][:, None, :]
        .repeat(T, axis=1),
        "encoder_mask": ones_m,
        "decoder_mask": ones_m,
        "cycle_encoder_mask": ones_m,
        "cycle_decoder_mask": ones_m,
    }
    if label_padding:
        batch["org_h"][:, -label_padding:] = IGNORE_INDEX
    return batch
