"""Multi-chip sharding tests on the 8-device virtual CPU mesh: sharded
multi-stream execution must agree with per-stream sequential execution."""

from collections import OrderedDict

import numpy as np
import jax
import jax.numpy as jnp

from async_ev_cnn_tpu.layers.network import EventNetwork
from async_ev_cnn_tpu.layers.types import EventChunk
from async_ev_cnn_tpu.parallel import MultiStreamEngine, make_mesh
from async_ev_cnn_tpu.utils.equivalence import make_stream


def build_net_params(rng):
    layer_defs = OrderedDict(
        [("conv1", [3, 3, 1, 8]), ("pool1", [2, 2]), ("conv2", [3, 3, 8, 16]), ("pool2", [2, 2])]
    )
    params = {
        "w_conv1": jnp.asarray(rng.randn(3, 3, 1, 8).astype(np.float32) * 0.3),
        "b_conv1": jnp.asarray(rng.randn(8).astype(np.float32) * 0.1),
        "w_conv2": jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.3),
        "b_conv2": jnp.asarray(rng.randn(16).astype(np.float32) * 0.1),
    }
    net = EventNetwork(layer_defs, 16, 16, leak=0.01, alpha=0.1, padding="SAME")
    return net, params


def stack_streams(streams):
    """[per-stream EventChunk of [T, E]] -> EventChunk of [T, S, E]."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=1), *streams)


def _run_mesh(n_data, n_model, rng):
    net, params = build_net_params(rng)
    n_streams = 4
    steps = 8
    streams = [make_stream(rng, steps, 6, 16, 16) for _ in range(n_streams)]
    chunks_tse = stack_streams(streams)

    mesh = make_mesh(n_data=n_data, n_model=n_model)
    eng = MultiStreamEngine(net, mesh)
    p = eng.place_params(params)
    states = eng.init_states(p, n_streams)
    states, outs = eng.scan(p, states, eng.place_chunks(chunks_tse, leading_time=True))
    outs = np.asarray(outs)  # [T, S, oh, ow, C]

    # sequential per-stream reference
    for s, stream in enumerate(streams):
        st = net.init_state(params)
        _, ref = jax.jit(net.scan)(params, st, stream)
        np.testing.assert_allclose(outs[:, s], np.asarray(ref), atol=1e-5)


def test_multi_stream_data_parallel(rng):
    assert jax.device_count() == 8
    _run_mesh(n_data=4, n_model=1, rng=rng)


def test_multi_stream_data_and_model_parallel(rng):
    _run_mesh(n_data=4, n_model=2, rng=rng)


def test_multi_stream_scan_parallel(rng):
    """Parallel-in-time serving over the mesh: full-mode net, every stream
    time-batched, sharded over data — must agree with per-stream scans."""
    layer_defs = OrderedDict(
        [("conv1", [3, 3, 1, 8]), ("pool1", [2, 2]), ("conv2", [3, 3, 8, 16]), ("pool2", [2, 2])]
    )
    params = {
        "w_conv1": jnp.asarray(rng.randn(3, 3, 1, 8).astype(np.float32) * 0.3),
        "b_conv1": jnp.asarray(rng.randn(8).astype(np.float32) * 0.1),
        "w_conv2": jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.3),
        "b_conv2": jnp.asarray(rng.randn(16).astype(np.float32) * 0.1),
    }
    net = EventNetwork(layer_defs, 16, 16, leak=0.01, alpha=0.1,
                       padding="SAME", conv_mode="full")
    n_streams, steps = 4, 8
    streams = [make_stream(rng, steps, 6, 16, 16) for _ in range(n_streams)]
    chunks_tse = stack_streams(streams)
    mesh = make_mesh(n_data=4, n_model=2)
    eng = MultiStreamEngine(net, mesh)
    p = eng.place_params(params)
    states = eng.init_states(p, n_streams)
    states, outs = eng.scan_parallel(
        p, states, eng.place_chunks(chunks_tse, leading_time=True)
    )
    outs = np.asarray(outs)  # [T, S, ...]
    for s, stream in enumerate(streams):
        st = net.init_state(params)
        _, ref = jax.jit(net.scan)(params, st, stream)
        np.testing.assert_allclose(outs[:, s], np.asarray(ref), atol=1e-5)


def test_mesh_size_one_fallback(rng):
    # mesh-size-1 must also work (single-chip deployment path)
    net, params = build_net_params(rng)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    eng = MultiStreamEngine(net, mesh)
    p = eng.place_params(params)
    states = eng.init_states(p, 2)
    stream = make_stream(rng, 3, 6, 16, 16)
    chunks = jax.tree.map(lambda a: a[:, None, :].repeat(2, axis=1), stream)
    states, outs = eng.scan(p, states, eng.place_chunks(chunks, leading_time=True))
    assert np.asarray(outs).shape[1] == 2
    np.testing.assert_allclose(np.asarray(outs)[:, 0], np.asarray(outs)[:, 1], atol=0)
