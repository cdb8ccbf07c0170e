"""Multi-chip sharding tests on the 8-device virtual CPU mesh: sharded
multi-stream execution must agree with per-stream sequential execution."""

from collections import OrderedDict

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from async_ev_cnn_tpu.layers.network import EventNetwork
from async_ev_cnn_tpu.layers.types import EventChunk
from async_ev_cnn_tpu.parallel import MultiStreamEngine, make_mesh
from async_ev_cnn_tpu.utils.config import layers_dict
from async_ev_cnn_tpu.utils.equivalence import make_stream
from async_ev_cnn_tpu.utils.runner import pack_chunks


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


def _full_net_params(rng, h=16, w=16, leak=0.05):
    layer_defs = OrderedDict(conv1=[3, 3, 1, 8], pool1=[2, 2], conv2=[1, 1, 8, 12])
    params = {}
    for name, size in layer_defs.items():
        if "conv" in name:
            kh, kw, ci, co = size
            params[f"w_{name}"] = jnp.asarray(
                rng.randn(kh, kw, ci, co).astype(np.float32) * 0.2)
            params[f"b_{name}"] = jnp.asarray(
                rng.randn(co).astype(np.float32) * 0.2)
    net = EventNetwork(layer_defs, h, w, leak=leak, alpha=0.1,
                       padding="SAME", conv_mode="full")
    return net, params


def test_time_shard_matches_scan_parallel(rng):
    """Sequence parallelism: one stream's time axis over 8 devices must
    reproduce the single-device parallel-in-time outputs AND the sequential
    scan, including the carried state across two successive dispatches."""
    from async_ev_cnn_tpu.parallel import TimeShardEngine, make_time_mesh

    net, params = _full_net_params(rng)
    mesh = make_time_mesh(8)
    eng = TimeShardEngine(net, mesh)
    stream1 = make_stream(rng, 16, 6, 16, 16)
    # second window continues the timestamp chain
    base = int(np.asarray(stream1.ts).max())
    stream2 = make_stream(rng, 16, 6, 16, 16)
    stream2 = stream2._replace(ts=stream2.ts + base)

    st_a = st_b = net.init_state(params)
    for stream in (stream1, stream2):
        st_a, outs_a = eng.scan_parallel(params, st_a, stream)
        st_b, outs_b = jax.jit(net.scan_parallel)(params, st_b, stream)
        np.testing.assert_allclose(
            np.asarray(outs_a), np.asarray(outs_b), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(st_a[0].surface), np.asarray(st_b[0].surface), atol=1e-5)
        assert int(st_a[0].prev_ts) == int(st_b[0].prev_ts)

    # and the sequential oracle over the full concatenation
    st_seq = net.init_state(params)
    both = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), stream1, stream2)
    _, outs_seq = jax.jit(net.scan)(params, st_seq, both)
    st0, outs_1 = eng.scan_parallel(params, net.init_state(params), stream1)
    _, outs_2 = eng.scan_parallel(params, st0, stream2)
    got = np.concatenate([np.asarray(outs_1), np.asarray(outs_2)])
    np.testing.assert_allclose(got, np.asarray(outs_seq), atol=1e-4)


def test_time_shard_polarity_and_errors(rng):
    from async_ev_cnn_tpu.parallel import TimeShardEngine, make_time_mesh

    # 2-channel polarity surface
    layer_defs = OrderedDict(conv1=[3, 3, 2, 8], conv2=[1, 1, 8, 4])
    params = {}
    for name, size in layer_defs.items():
        kh, kw, ci, co = size
        params[f"w_{name}"] = jnp.asarray(rng.randn(kh, kw, ci, co).astype(np.float32) * 0.2)
        params[f"b_{name}"] = jnp.asarray(rng.randn(co).astype(np.float32) * 0.2)
    net = EventNetwork(layer_defs, 16, 16, leak=0.05, alpha=0.1,
                       padding="SAME", conv_mode="full")
    stream = make_stream(rng, 8, 6, 16, 16, random_polarity=True)
    eng = TimeShardEngine(net, make_time_mesh(4))
    st, outs = eng.scan_parallel(params, net.init_state(params), stream)
    _, ref = jax.jit(net.scan_parallel)(params, net.init_state(params), stream)
    np.testing.assert_allclose(np.asarray(outs), np.asarray(ref), atol=1e-5)

    # T not divisible by mesh size
    bad = jax.tree.map(lambda a: a[:7], stream)
    try:
        eng.scan_parallel(params, net.init_state(params), bad)
        assert False, "expected ValueError"
    except ValueError:
        pass

    # non-'full' networks are rejected
    net_dense = EventNetwork(
        OrderedDict(conv1=[3, 3, 1, 8]), 16, 16, leak=0.05, alpha=0.1,
        padding="SAME", conv_mode="dense")
    try:
        TimeShardEngine(net_dense, make_time_mesh(4))
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_time_shard_streams_2d_mesh(rng):
    """dp x sp composition: 4 streams x time over a (2, 4) mesh must match
    per-stream single-device scan_parallel."""
    from async_ev_cnn_tpu.parallel import TimeShardEngine, make_time_mesh

    net, params = _full_net_params(rng)
    mesh = make_time_mesh(8, n_streams=2)
    assert mesh.axis_names == ("data", "time")
    eng = TimeShardEngine(net, mesh, stream_axis="data")
    streams = [make_stream(rng, 8, 6, 16, 16) for _ in range(4)]
    chunks = jax.tree.map(lambda *xs: jnp.stack(xs), *streams)  # [S, T, E]
    base = net.init_state(params)
    states = jax.tree.map(lambda a: jnp.broadcast_to(a, (4, *a.shape)), base)
    new_states, outs = eng.scan_parallel(params, states, chunks)
    assert outs.shape[:2] == (4, 8)
    for s, stream in enumerate(streams):
        _, ref = jax.jit(net.scan_parallel)(params, net.init_state(params), stream)
        np.testing.assert_allclose(
            np.asarray(outs[s]), np.asarray(ref), atol=1e-5, err_msg=f"s={s}")
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(new_states)[0][s]),
            np.asarray(jax.tree.leaves(jax.jit(net.scan_parallel)(
                params, net.init_state(params), stream)[0])[0]),
            atol=1e-5)


@pytest.mark.slow
def test_time_shard_long_horizon_drift(rng):
    """20 successive time-sharded dispatches (320 chunks) must track the
    sequential scan within the 1e-4 contract — guards cumulative regrouping
    drift across the cross-device prefix compositions."""
    from async_ev_cnn_tpu.parallel import TimeShardEngine, make_time_mesh

    net, params = _full_net_params(rng, leak=0.02)
    eng = TimeShardEngine(net, make_time_mesh(8))
    st_sp = st_seq = net.init_state(params)
    base = 0
    for _ in range(20):
        stream = make_stream(rng, 16, 6, 16, 16)
        stream = stream._replace(ts=stream.ts + base)
        base = int(np.asarray(stream.ts).max())
        st_sp, outs_sp = eng.scan_parallel(params, st_sp, stream)
        st_seq, outs_seq = jax.jit(net.scan)(params, st_seq, stream)
        np.testing.assert_allclose(
            np.asarray(outs_sp), np.asarray(outs_seq), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(st_sp[0].surface), np.asarray(st_seq[0].surface), atol=1e-4)


def _collect_collectives(jaxpr, out=None):
    """Recursively walk a jaxpr (incl. pjit/shard_map/scan sub-jaxprs)
    and collect (primitive_name, invar_elems, outvar_elems) for every
    cross-device collective equation."""
    import jax.core

    collectives = {"all_gather", "psum", "ppermute", "all_to_all",
                   "reduce_scatter", "pmax", "pmin", "all_gather_invariant"}
    out = [] if out is None else out
    for eqn in jaxpr.eqns:
        if eqn.primitive.name in collectives:
            n_in = sum(int(np.prod(v.aval.shape)) for v in eqn.invars
                       if hasattr(v.aval, "shape"))
            n_out = sum(int(np.prod(v.aval.shape)) for v in eqn.outvars
                        if hasattr(v.aval, "shape"))
            out.append((eqn.primitive.name, n_in, n_out))
        for val in eqn.params.values():
            for sub in (val if isinstance(val, (list, tuple)) else [val]):
                inner = getattr(sub, "jaxpr", None)
                if inner is not None:
                    _collect_collectives(inner, out)
                elif hasattr(sub, "eqns"):
                    _collect_collectives(sub, out)
    return out


def test_time_shard_ici_traffic_independent_of_T(rng):
    """The TimeShardEngine's documented contract: cross-device traffic is
    O(D * C*H*W) per dispatch, INDEPENDENT of T (time_shard.py module
    docstring).  Inspect the traced jaxpr and assert the collective
    operand sizes do not scale with T — a future edit (e.g. gathering
    the per-chunk prefixes instead of the device totals) cannot silently
    regress the claim.  Also pins the collective set itself: exactly the
    three all_gathers of the prefix-composition round (the check_vma=False
    replication invariant relies on that structure)."""
    import jax

    from async_ev_cnn_tpu.parallel.time_shard import (
        TimeShardEngine,
        make_time_mesh,
    )

    h = w = 16
    cap = 8
    dsl = "conv1=3,3,1,4 pool1=2,2 conv2=1,1,4,6"
    net = EventNetwork(layers_dict(dsl), h, w, leak=1e-4, alpha=0.1,
                       padding="SAME", conv_mode="full")
    params = {}
    for name, size in layers_dict(dsl).items():
        if "conv" in name:
            params[f"w_{name}"] = jnp.asarray(
                rng.randn(*size[:2], size[2], size[3]).astype(np.float32))
            params[f"b_{name}"] = jnp.asarray(
                rng.randn(size[3]).astype(np.float32))
    mesh = make_time_mesh(8)
    engine = TimeShardEngine(net, mesh)
    state = net.init_state(params)

    def traffic(t):
        ev = np.stack([
            rng.randint(0, h, t * cap), rng.randint(0, w, t * cap),
            np.sort(rng.randint(1, 10000, t * cap)),
        ], axis=-1).astype(np.int32)
        chunks = pack_chunks(ev, cap)
        engine._build()
        jaxpr = jax.make_jaxpr(
            lambda p, s, c: engine._jit(p, s, c))(params, state, chunks)
        return _collect_collectives(jaxpr.jaxpr)

    t32, t64 = traffic(32), traffic(64)
    assert t32, "no collectives found — the walker or the engine changed"
    assert t32 == t64, (
        f"collective traffic scales with T: {t32} vs {t64}")
    # exactly the documented round: all_gather of the scalar ts maxes +
    # all_gather of the (b, c) device totals (C*H*W each)
    names = sorted(n for n, _, _ in t32)
    assert set(names) == {"all_gather"} or set(names) == {
        "all_gather_invariant"}, names
    sizes = sorted(n_in for _, n_in, _ in t32)
    assert sizes == [1, 1 * h * w, 1 * h * w], sizes
