"""Checkpoint loading: npz round-trip and the pure-Python TensorBundle
reader validated against real TensorFlow-written checkpoints (TF is present
in the dev environment only; the reader itself has no TF dependency)."""

import os

import numpy as np
import pytest

from async_ev_cnn_tpu.utils.checkpoint import latest_checkpoint, load_params, save_params

tf = pytest.importorskip("tensorflow")


@pytest.fixture
def ckpt_vars(rng):
    return {
        "w_conv1": rng.randn(3, 3, 1, 16).astype(np.float32),
        "b_conv1": rng.randn(16).astype(np.float32),
        "w_conv2": rng.randn(3, 3, 16, 32).astype(np.float32),
        "b_conv2": rng.randn(32).astype(np.float32),
        "w_fc1": rng.randn(128, 64).astype(np.float32),
        "b_fc1": rng.randn(64).astype(np.float32),
        "step": np.int64(1234),
    }


def write_tf_checkpoint(tmp_path, variables):
    tf_vars = {k: tf.Variable(v, name=k) for k, v in variables.items()}
    ckpt = tf.train.Checkpoint(**tf_vars)
    prefix = ckpt.write(os.path.join(tmp_path, "model.ckpt"))
    return prefix


def test_npz_roundtrip(tmp_path, ckpt_vars):
    path = os.path.join(tmp_path, "weights.npz")
    save_params(path, ckpt_vars)
    loaded = load_params(path)
    for k, v in ckpt_vars.items():
        np.testing.assert_array_equal(loaded[k], v)


def test_tf_bundle_reader_matches_tf(tmp_path, ckpt_vars):
    from async_ev_cnn_tpu.utils.tf_bundle import list_variables, load_tensor_bundle

    prefix = write_tf_checkpoint(tmp_path, ckpt_vars)
    loaded = load_tensor_bundle(prefix)
    # tf.train.Checkpoint nests names as "<name>/.ATTRIBUTES/VARIABLE_VALUE"
    by_leaf = {}
    for key, arr in loaded.items():
        leaf = key.split("/")[0]
        by_leaf[leaf] = arr
    for k, v in ckpt_vars.items():
        assert k in by_leaf, f"{k} missing from {sorted(by_leaf)}"
        np.testing.assert_array_equal(by_leaf[k], v)
    shapes = list_variables(prefix)
    assert any(k.startswith("w_conv1") for k in shapes)


def test_tf_bundle_many_vars_multiblock(tmp_path, rng):
    # Enough variables to force multiple index blocks / prefix compression.
    variables = {f"w_conv{i:03d}": rng.randn(7, 11).astype(np.float32) for i in range(120)}
    prefix = write_tf_checkpoint(tmp_path, variables)
    from async_ev_cnn_tpu.utils.tf_bundle import load_tensor_bundle

    loaded = load_tensor_bundle(prefix)
    found = 0
    for key, arr in loaded.items():
        leaf = key.split("/")[0]
        if leaf in variables:
            np.testing.assert_array_equal(arr, variables[leaf])
            found += 1
    assert found == 120


def test_tf_bundle_writer_readable_by_tensorflow(tmp_path, rng):
    """Our pure-Python TF-bundle WRITER must produce checkpoints TensorFlow
    itself can read — the export direction of the interop."""
    from async_ev_cnn_tpu.utils.tf_bundle import load_tensor_bundle, save_tensor_bundle

    tensors = {
        "w_conv1": rng.randn(3, 3, 1, 16).astype(np.float32),
        "b_conv1": rng.randn(16).astype(np.float32),
        "w_fc1": rng.randn(32, 8).astype(np.float64),
        "counter": np.arange(7, dtype=np.int64),
    }
    prefix = os.path.join(str(tmp_path), "export.ckpt")
    save_tensor_bundle(prefix, tensors)

    # 1) our own reader round-trips
    loaded = load_tensor_bundle(prefix)
    for k, v in tensors.items():
        np.testing.assert_array_equal(loaded[k], v)

    # 2) TensorFlow reads it
    reader = tf.train.load_checkpoint(prefix)
    for k, v in tensors.items():
        np.testing.assert_array_equal(reader.get_tensor(k), v)


def test_orbax_roundtrip(tmp_path, ckpt_vars):
    from async_ev_cnn_tpu.utils.checkpoint import save_params_orbax

    d = str(tmp_path / "orbax_ckpt")
    params = {k: v for k, v in ckpt_vars.items() if k != "step"}
    save_params_orbax(d, params)
    loaded = load_params(d)
    for k, v in params.items():
        np.testing.assert_array_equal(loaded[k], v)


def test_latest_checkpoint_resolution(tmp_path, ckpt_vars):
    prefix = write_tf_checkpoint(tmp_path, ckpt_vars)
    # tf.train.Checkpoint.write does not write a 'checkpoint' marker file;
    # resolution should fall back to newest .index
    resolved = latest_checkpoint(os.path.dirname(prefix))
    assert resolved == prefix
    params = load_params(os.path.dirname(prefix))
    assert any("w_conv1" in k for k in params)


def test_stream_state_save_restore(tmp_path, rng):
    """Serving state (mid-stream surfaces/featuremaps/timestamps) must
    round-trip a save/restore and continue bit-identically."""
    from collections import OrderedDict

    import jax
    import jax.numpy as jnp

    from async_ev_cnn_tpu.layers.network import EventNetwork
    from async_ev_cnn_tpu.utils.checkpoint import (
        restore_stream_state,
        save_stream_state,
    )
    from async_ev_cnn_tpu.utils.equivalence import make_stream

    layer_defs = OrderedDict(conv1=[3, 3, 1, 4], pool1=[2, 2], conv2=[1, 1, 4, 6])
    params = {}
    for name, size in layer_defs.items():
        if "conv" in name:
            kh, kw, ci, co = size
            params[f"w_{name}"] = jnp.asarray(
                rng.randn(kh, kw, ci, co).astype(np.float32) * 0.2)
            params[f"b_{name}"] = jnp.asarray(
                rng.randn(co).astype(np.float32) * 0.2)
    net = EventNetwork(layer_defs, 16, 16, leak=0.01, alpha=0.1,
                       padding="SAME", conv_mode="dense")
    s1 = make_stream(rng, 6, 5, 16, 16)
    s2 = make_stream(rng, 6, 5, 16, 16)
    s2 = s2._replace(ts=s2.ts + int(np.asarray(s1.ts).max()))

    state = net.init_state(params)
    state, _ = jax.jit(net.scan)(params, state, s1)
    path = str(tmp_path / "serving_state.npz")
    save_stream_state(path, state)
    restored = restore_stream_state(path, net.init_state(params))
    st_a, outs_a = jax.jit(net.scan)(params, state, s2)
    st_b, outs_b = jax.jit(net.scan)(params, restored, s2)
    np.testing.assert_array_equal(np.asarray(outs_a), np.asarray(outs_b))

    # structure mismatches fail loudly
    import pytest

    wrong = net.init_state(params)[:-1]
    with pytest.raises(ValueError):
        restore_stream_state(path, wrong)


def test_corrupt_bundle_data_refused(tmp_path, ckpt_vars):
    """A bit-flipped .data shard must fail the per-tensor crc32c check
    (TF's BundleReader raises DataLoss there too), not load as weights."""
    from async_ev_cnn_tpu.utils.checkpoint import save_params_tf
    from async_ev_cnn_tpu.utils.tf_bundle import load_tensor_bundle

    prefix = str(tmp_path / "ckpt")
    save_params_tf(prefix, ckpt_vars)
    data_path = prefix + ".data-00000-of-00001"
    raw = bytearray(open(data_path, "rb").read())
    raw[len(raw) // 2] ^= 0xFF
    open(data_path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="checksum"):
        load_tensor_bundle(prefix)


def test_save_params_exact_path_no_suffix(tmp_path, ckpt_vars):
    """save/load are symmetric for extension-free paths: the old writer
    appended '.npz', so serve --serve_state state.ckpt wrote
    state.ckpt.npz and the restore's existence check never fired."""
    path = str(tmp_path / "weights.ckpt")
    save_params(path, ckpt_vars)
    assert os.path.exists(path)
    out = load_params(path)
    np.testing.assert_array_equal(out["w_conv1"], ckpt_vars["w_conv1"])


def test_tf_export_writes_checkpoint_marker(tmp_path, ckpt_vars):
    """save_params_tf writes the 'checkpoint' CheckpointState marker so
    directory-based resolution (tf.train.latest_checkpoint and ours)
    finds the export."""
    from async_ev_cnn_tpu.utils.checkpoint import save_params_tf

    prefix = str(tmp_path / "export")
    save_params_tf(prefix, ckpt_vars)
    assert latest_checkpoint(str(tmp_path)) == prefix
    assert tf.train.latest_checkpoint(str(tmp_path)) == prefix


def test_restore_stream_state_refuses_x64_demotion(tmp_path):
    """An int64 leaf would be silently demoted to int32 by jnp.asarray
    under default x64-disabled JAX — values >= 2**31 wrap; refuse."""
    import jax.numpy as jnp

    from async_ev_cnn_tpu.utils.checkpoint import (
        restore_stream_state,
        save_stream_state,
    )

    state = [np.int64(2**40), np.float32(1.5)]
    path = str(tmp_path / "st.npz")
    save_stream_state(path, state)
    with pytest.raises(ValueError, match="demoted"):
        restore_stream_state(path, like=state)
