"""MOSNet Keras->flax converter correctness.

The published checkpoint can't be fetched in this environment, so the
converter is validated structurally AND numerically: a random Keras-layout
.h5 is synthesized, converted, loaded into the flax MOSNet, and compared
against an independent pure-numpy implementation of the Keras CNN-BLSTM
forward pass (TF SAME conv padding, i-f-c-o gate order, bias on the
recurrent half). Agreement proves gate order, padding semantics and bias
placement — the things that silently corrupt a weight port.
"""

import sys
from pathlib import Path

import h5py
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import convert_mosnet  # noqa: E402


def _make_keras_h5(path, rng):
    """Random weights in the published MOSNet CNN-BLSTM h5 layout."""
    chans = [(1, 16), (16, 16), (16, 16),
             (16, 32), (32, 32), (32, 32),
             (32, 64), (64, 64), (64, 64),
             (64, 128), (128, 128), (128, 128)]
    with h5py.File(path, "w") as fp:
        root = fp.create_group("model_weights")
        layer_names = []

        def add_layer(name, weights):
            grp = root.create_group(name)
            wnames = []
            for wname, arr in weights:
                grp.create_dataset(wname, data=arr.astype(np.float32))
                wnames.append(wname)
            grp.attrs["weight_names"] = np.array(
                [w.encode() for w in wnames])
            layer_names.append(name.encode())

        for i, (cin, cout) in enumerate(chans):
            add_layer(f"conv2d_{i + 1}", [
                (f"conv2d_{i + 1}/kernel:0",
                 0.3 * rng.standard_normal((3, 3, cin, cout))),
                (f"conv2d_{i + 1}/bias:0", 0.1 * rng.standard_normal(cout)),
            ])
        u, inp = 128, 512
        add_layer("bidirectional_1", [
            ("forward_lstm_1/kernel:0",
             0.2 * rng.standard_normal((inp, 4 * u))),
            ("forward_lstm_1/recurrent_kernel:0",
             0.2 * rng.standard_normal((u, 4 * u))),
            ("forward_lstm_1/bias:0", 0.1 * rng.standard_normal(4 * u)),
            ("backward_lstm_1/kernel:0",
             0.2 * rng.standard_normal((inp, 4 * u))),
            ("backward_lstm_1/recurrent_kernel:0",
             0.2 * rng.standard_normal((u, 4 * u))),
            ("backward_lstm_1/bias:0", 0.1 * rng.standard_normal(4 * u)),
        ])
        add_layer("time_distributed_1", [
            ("dense_1/kernel:0", 0.2 * rng.standard_normal((256, 128))),
            ("dense_1/bias:0", 0.1 * rng.standard_normal(128)),
        ])
        add_layer("time_distributed_2", [
            ("dense_2/kernel:0", 0.2 * rng.standard_normal((128, 1))),
            ("dense_2/bias:0", 0.1 * rng.standard_normal(1)),
        ])
        root.attrs["layer_names"] = np.array(layer_names)


# ------------------------- numpy Keras reference ------------------------- #


def _conv2d_same(x, kernel, bias, stride_w):
    """TF SAME conv, stride (1, stride_w). x: [T, W, Cin]."""
    t, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    out_w = -(-w // stride_w)
    pad_h = kh - 1
    pad_w = max((out_w - 1) * stride_w + kw - w, 0)
    xp = np.pad(x, ((pad_h // 2, pad_h - pad_h // 2),
                    (pad_w // 2, pad_w - pad_w // 2), (0, 0)))
    cols = np.empty((t, out_w, kh * kw * cin))
    for i in range(t):
        for j in range(out_w):
            patch = xp[i:i + kh, j * stride_w:j * stride_w + kw]
            cols[i, j] = patch.reshape(-1)
    return cols @ kernel.reshape(-1, cout) + bias


def _sigmoid(z):
    return 1.0 / (1.0 + np.exp(-z))


def _lstm(x, kernel, recurrent, bias, reverse=False):
    """Keras LSTM (gate order i, f, c, o). x: [T, D] -> [T, U]."""
    if reverse:
        x = x[::-1]
    u = recurrent.shape[0]
    h = np.zeros(u)
    c = np.zeros(u)
    out = np.empty((x.shape[0], u))
    for t in range(x.shape[0]):
        z = x[t] @ kernel + h @ recurrent + bias
        i = _sigmoid(z[:u])
        f = _sigmoid(z[u:2 * u])
        g = np.tanh(z[2 * u:3 * u])
        o = _sigmoid(z[3 * u:])
        c = f * c + i * g
        h = o * np.tanh(c)
        out[t] = h
    return out[::-1] if reverse else out


def _numpy_mosnet(mag, h5path):
    with h5py.File(h5path, "r") as fp:
        root = fp["model_weights"]

        def arrs(layer):
            grp = root[layer]
            return [np.asarray(grp[w.decode()])
                    for w in grp.attrs["weight_names"]]

        x = mag[..., None]
        for i in range(12):
            k, b = arrs(f"conv2d_{i + 1}")
            x = _conv2d_same(x, k, b, 3 if i % 3 == 2 else 1)
            x = np.maximum(x, 0.0)
        x = x.reshape(x.shape[0], -1)
        fk, fr, fb, bk, br, bb = arrs("bidirectional_1")
        x = np.concatenate(
            [_lstm(x, fk, fr, fb), _lstm(x, bk, br, bb, reverse=True)], -1)
        k1, b1 = arrs("time_distributed_1")
        x = np.maximum(x @ k1 + b1, 0.0)
        k2, b2 = arrs("time_distributed_2")
        frame = (x @ k2 + b2)[..., 0]
        return frame.mean(), frame


@pytest.mark.slow
def test_converted_weights_match_keras_semantics(tmp_path):
    import jax.numpy as jnp

    from crank_tpu.eval.mosnet import MOSNet, load_params

    rng = np.random.default_rng(0)
    keras_h5 = tmp_path / "cnn_blstm.h5"
    _make_keras_h5(keras_h5, rng)

    flat = convert_mosnet.convert(keras_h5)
    npz = tmp_path / "mosnet.npz"
    np.savez(npz, **{k: v.astype(np.float32) for k, v in flat.items()})
    params = load_params(npz)

    mag = 0.5 * rng.standard_normal((6, 257)).astype(np.float32) ** 2
    avg_ref, frame_ref = _numpy_mosnet(mag.astype(np.float64), keras_h5)

    model = MOSNet()
    avg, frame = model.apply({"params": params}, jnp.asarray(mag[None]))
    np.testing.assert_allclose(np.asarray(frame[0]), frame_ref, atol=2e-3)
    np.testing.assert_allclose(float(avg[0]), avg_ref, atol=2e-3)


def test_converter_rejects_wrong_layout(tmp_path):
    with h5py.File(tmp_path / "bad.h5", "w") as fp:
        g = fp.create_group("model_weights").create_group("dense")
        g.create_dataset("dense/kernel:0", data=np.zeros((4, 4), np.float32))
        g.attrs["weight_names"] = np.array([b"dense/kernel:0"])
        fp["model_weights"].attrs["layer_names"] = np.array([b"dense"])
    with pytest.raises(ValueError, match="unexpected MOSNet layout"):
        convert_mosnet.convert(tmp_path / "bad.h5")


def test_mosnet_score_length_invariant():
    """Bucket padding must not change the score (round-1 bug: mean over
    padded frames made scores depend on length mod 64)."""
    import jax
    import jax.numpy as jnp

    from crank_tpu.eval.mosnet import MOSNet

    model = MOSNet()
    rng = np.random.default_rng(1)
    mag = rng.standard_normal((1, 40, 257)).astype(np.float32) ** 2
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(mag))["params"]
    s_exact, _ = model.apply({"params": params}, jnp.asarray(mag))
    padded = np.pad(mag, ((0, 0), (0, 24), (0, 0)))
    s_padded, _ = model.apply({"params": params}, jnp.asarray(padded),
                              lengths=jnp.asarray([40]))
    np.testing.assert_allclose(float(s_padded[0]), float(s_exact[0]),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_converter_vs_real_tensorflow(tmp_path):
    """VERDICT r2 #8: validate the Keras->flax converter against REAL
    TensorFlow, not a hand-rolled semantics clone.  Builds the MOSNet
    CNN-BLSTM in Keras (Lo et al. 2019 architecture), writes its weights in
    the legacy h5 layout the published checkpoint uses, converts, and
    compares per-frame scores TF vs flax on the same input."""
    tf = pytest.importorskip("tensorflow")  # noqa: F841
    import keras
    from keras import layers
    from keras.src.legacy.saving import legacy_h5_format

    keras.utils.set_random_seed(1234)
    inp = keras.Input(shape=(None, 257))
    x = layers.Reshape((-1, 257, 1))(inp)
    for ch in (16, 32, 64, 128):
        x = layers.Conv2D(ch, (3, 3), strides=(1, 1), activation="relu",
                          padding="same")(x)
        x = layers.Conv2D(ch, (3, 3), strides=(1, 1), activation="relu",
                          padding="same")(x)
        x = layers.Conv2D(ch, (3, 3), strides=(1, 3), activation="relu",
                          padding="same")(x)
    x = layers.Reshape((-1, 4 * 128))(x)
    x = layers.Bidirectional(layers.LSTM(128, return_sequences=True),
                             merge_mode="concat")(x)
    x = layers.TimeDistributed(layers.Dense(128, activation="relu"))(x)
    frame = layers.TimeDistributed(layers.Dense(1))(x)
    model = keras.Model(inp, frame)

    rng = np.random.default_rng(77)
    T = 37
    mag = np.abs(rng.standard_normal((1, T, 257))).astype(np.float32)
    frame_tf = np.asarray(model.predict(mag, verbose=0))[0, :, 0]

    h5_path = tmp_path / "mosnet_tf.h5"
    with h5py.File(h5_path, "w") as fp:
        legacy_h5_format.save_weights_to_hdf5_group(fp, model)

    flat = convert_mosnet.convert(h5_path)

    import jax.numpy as jnp
    from flax.traverse_util import unflatten_dict

    from crank_tpu.eval.mosnet import MOSNet

    params = unflatten_dict(
        {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()}
    )
    avg, frame_j = MOSNet().apply(
        {"params": params}, jnp.asarray(mag),
        lengths=jnp.asarray([T], jnp.int32),
    )
    frame_j = np.asarray(frame_j)[0]
    err = float(np.max(np.abs(frame_tf - frame_j)))
    assert err < 1e-4, f"TF vs flax frame-score max err {err}"
    assert abs(float(np.asarray(avg)[0]) - float(frame_tf.mean())) < 1e-4
