#!/usr/bin/env python3
"""Convert a published MOSNet (CNN-BLSTM) Keras .h5 checkpoint to the flax
.npz format consumed by crank_tpu.eval.mosnet.load_params.

The reference reaches MOSNet through speechmetrics/TensorFlow
(crank/bin/evaluate_mosnet.py:43-53); this framework re-implements the
CNN-BLSTM in flax and loads the SAME published weights through this
converter, so stage-7 MOS predictions are comparable.

Works on the weight file alone with h5py — TensorFlow is NOT required.

Layout mapping (Keras -> flax, see crank_tpu/eval/mosnet.py param tree):
  12 Conv2D kernels/biases, in order  -> ConvBlock_{i//3}/Conv_{i%3}
     (TF kernel [kh,kw,in,out] == flax layout, copied verbatim)
  Bidirectional LSTM (fwd, bwd), each kernel [in,4u] / recurrent [u,4u] /
  bias [4u] with Keras gate order (i, f, c, o)
                                      -> OptimizedLSTMCell_{0,1}/{ii,if,ig,io}
                                         (input kernels, no bias) and
                                         {hi,hf,hg,ho} (recurrent kernels;
                                         the Keras bias lands on the h gates)
  2 Dense layers, in order            -> Dense_0 (128), Dense_1 (1)

Usage:
    python tools/convert_mosnet.py --keras_h5 cnn_blstm.h5 --out mosnet.npz
"""

import argparse

import h5py
import numpy as np

GATES = ("i", "f", "g", "o")  # flax names; Keras order is i, f, c(=g), o


def _weights_root(fp):
    return fp["model_weights"] if "model_weights" in fp else fp


def _layer_arrays(fp):
    """Yield (layer_name, [np arrays in stored order]) in model order."""
    root = _weights_root(fp)
    names = [n.decode() if isinstance(n, bytes) else n
             for n in root.attrs.get("layer_names", list(root.keys()))]
    for name in names:
        grp = root[name]
        wnames = [w.decode() if isinstance(w, bytes) else w
                  for w in grp.attrs.get("weight_names", [])]
        if not wnames:  # fall back to recursive dataset walk
            wnames = []
            grp.visit(lambda k: wnames.append(k)
                      if isinstance(grp[k], h5py.Dataset) else None)
        arrays = [np.asarray(grp[w]) for w in wnames]
        if arrays:
            yield name, arrays


def _split_lstm(kernel, recurrent, bias):
    """One direction's Keras LSTM arrays -> flax OptimizedLSTMCell dict."""
    units = recurrent.shape[0]
    out = {}
    for g_idx, g in enumerate(GATES):
        sl = slice(g_idx * units, (g_idx + 1) * units)
        out[f"i{g}/kernel"] = kernel[:, sl]
        out[f"h{g}/kernel"] = recurrent[:, sl]
        out[f"h{g}/bias"] = bias[sl]
    return out


def convert(keras_h5):
    """Return a flat {path: array} dict of flax MOSNet params."""
    convs, lstm_dirs, denses = [], [], []
    with h5py.File(keras_h5, "r") as fp:
        for name, arrays in _layer_arrays(fp):
            kernels = [a for a in arrays if a.ndim == 4]
            if kernels:  # Conv2D layer (kernel + bias)
                bias = next(a for a in arrays if a.ndim == 1)
                convs.append((kernels[0], bias))
            elif len(arrays) == 6:  # Bidirectional LSTM: fwd then bwd triplet
                lstm_dirs.append(tuple(arrays[:3]))
                lstm_dirs.append(tuple(arrays[3:]))
            elif len(arrays) == 3 and arrays[0].ndim == 2 \
                    and arrays[1].ndim == 2:  # standalone LSTM direction
                lstm_dirs.append(tuple(arrays))
            elif arrays and arrays[0].ndim == 2:  # Dense (TimeDistributed)
                bias = arrays[1] if len(arrays) > 1 else \
                    np.zeros(arrays[0].shape[1], arrays[0].dtype)
                denses.append((arrays[0], bias))

    if len(convs) != 12 or len(lstm_dirs) != 2 or len(denses) != 2:
        raise ValueError(
            f"unexpected MOSNet layout: {len(convs)} convs, "
            f"{len(lstm_dirs)} LSTM directions, {len(denses)} denses "
            "(expected 12 / 2 / 2)"
        )

    flat = {}
    for i, (kernel, bias) in enumerate(convs):
        prefix = f"ConvBlock_{i // 3}/Conv_{i % 3}"
        flat[f"{prefix}/kernel"] = kernel
        flat[f"{prefix}/bias"] = bias
    for d, (kernel, recurrent, bias) in enumerate(lstm_dirs):
        for k, v in _split_lstm(kernel, recurrent, bias).items():
            flat[f"OptimizedLSTMCell_{d}/{k}"] = v
    for i, (kernel, bias) in enumerate(denses):
        flat[f"Dense_{i}/kernel"] = kernel
        flat[f"Dense_{i}/bias"] = bias
    return flat


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--keras_h5", required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args()
    flat = convert(args.keras_h5)
    np.savez(args.out, **{k: v.astype(np.float32) for k, v in flat.items()})
    print(f"wrote {args.out} ({len(flat)} arrays)")


if __name__ == "__main__":
    main()
