"""StreamingPipeline (utils/serving.py) must be EXACT vs driving
scan_parallel directly over the same chunks, in order, for every wire
format and stream count — it is the production serving loop behind the
sustained-pipeline benchmark."""

import numpy as np
import pytest

import jax

from async_ev_cnn_tpu.layers.network import EventNetwork
from async_ev_cnn_tpu.utils.config import layers_dict
from async_ev_cnn_tpu.utils.runner import pack_chunks
from async_ev_cnn_tpu.utils.serving import (
    DispatchResult,
    StreamingPipeline,
    threaded_source,
)

H = W = 16
CAP = 32
DSL = "conv1=3,3,1,4 pool1=2,2 conv2=3,3,4,8 pool2=2,2 conv3=1,1,8,12"


def _params(layer_defs, rng):
    out = {}
    for name, size in layer_defs.items():
        if "conv" in name:
            out[f"w_{name}"] = (
                rng.randn(*size[:2], size[2], size[3]).astype(np.float32) * 0.1
            )
            out[f"b_{name}"] = rng.randn(size[3]).astype(np.float32) * 0.1
    return out


def _net():
    return EventNetwork(layers_dict(DSL), H, W, leak=1e-4, alpha=0.1,
                        padding="SAME", conv_mode="full")


def _stream(rng, n):
    y = rng.randint(0, H, n).astype(np.int32)
    x = rng.randint(0, W, n).astype(np.int32)
    ts = np.cumsum(rng.randint(1, 20, n)).astype(np.int32)
    return np.stack([y, x, ts], axis=-1)


def _oracle(net, params, items):
    """Direct scan_parallel chain over the same per-item chunks."""
    import jax.numpy as jnp

    jparams = {k: jnp.asarray(v) for k, v in params.items()}
    state = net.init_state(jparams)
    outs = []
    for ev in items:
        state, o = jax.jit(
            lambda s, c: net.scan_parallel(jparams, s, c)
        )(state, pack_chunks(ev, CAP))
        outs.append(np.asarray(o))
    return outs


@pytest.mark.parametrize("wire", ["auto", "compact", "plain"])
@pytest.mark.parametrize("max_in_flight", [1, 3])
def test_pipeline_matches_scan_parallel(rng, wire, max_in_flight):
    net = _net()
    params = _params(layers_dict(DSL), rng)
    # contiguous stream split into 6 dispatch items, 2 chunks each
    items = [_stream(rng, 2 * CAP) for _ in range(6)]
    # keep timestamps monotone across items (one stream)
    t0 = 0
    for ev in items:
        ev[:, 2] += t0
        t0 = int(ev[-1, 2]) + 1
    want = _oracle(net, params, items)

    pipe = StreamingPipeline(net, params, capacity=CAP, wire=wire,
                             max_in_flight=max_in_flight)
    got = list(pipe.serve(items))
    assert len(got) == len(items)
    for res, ref, ev in zip(got, want, items):
        assert isinstance(res, DispatchResult)
        assert res.n_events == len(ev)
        np.testing.assert_allclose(np.asarray(res.outputs), ref,
                                   rtol=0, atol=1e-6)


def test_pipeline_multistream_matches_independent_chains(rng):
    net = _net()
    params = _params(layers_dict(DSL), rng)
    # two independent streams, 3 dispatches each, interleaved
    a = [_stream(rng, 2 * CAP) for _ in range(3)]
    b = [_stream(rng, 2 * CAP) for _ in range(3)]
    for seq in (a, b):
        t0 = 0
        for ev in seq:
            ev[:, 2] += t0
            t0 = int(ev[-1, 2]) + 1
    want_a, want_b = _oracle(net, params, a), _oracle(net, params, b)

    interleaved = [x for pair in zip(a, b) for x in pair]
    pipe = StreamingPipeline(net, params, capacity=CAP, streams=2,
                             max_in_flight=2)
    got = list(pipe.serve(interleaved))
    assert len(got) == 3
    for i, res in enumerate(got):
        outs = np.asarray(res.outputs)
        assert outs.shape[0] == 2
        np.testing.assert_allclose(outs[0], want_a[i], rtol=0, atol=1e-6)
        np.testing.assert_allclose(outs[1], want_b[i], rtol=0, atol=1e-6)


def test_pipeline_state_persists_across_serve_calls(rng):
    """Stop/resume mid-stream: two serve() calls over the halves equal
    one call over the whole stream."""
    net = _net()
    params = _params(layers_dict(DSL), rng)
    items = [_stream(rng, CAP) for _ in range(4)]
    t0 = 0
    for ev in items:
        ev[:, 2] += t0
        t0 = int(ev[-1, 2]) + 1
    want = _oracle(net, params, items)

    pipe = StreamingPipeline(net, params, capacity=CAP)
    got = list(pipe.serve(items[:2])) + list(pipe.serve(items[2:]))
    for res, ref in zip(got, want):
        np.testing.assert_allclose(np.asarray(res.outputs), ref,
                                   rtol=0, atol=1e-6)


def test_pipeline_postprocess_runs_on_device(rng):
    net = _net()
    params = _params(layers_dict(DSL), rng)
    items = [_stream(rng, CAP) for _ in range(2)]
    pipe = StreamingPipeline(net, params, capacity=CAP,
                             postprocess=lambda o: o.max(axis=(1, 2)))
    got = list(pipe.serve(items))
    # outs are [T, h_cells, w_cells, C]; the max over cells leaves [T, C]
    assert np.asarray(got[0].outputs).shape == (1, 12)


def test_pipeline_mixed_wire_group_falls_back(rng):
    """streams=2 where one item fits the compact wire and the other does
    not (ts span > 2**16 us): the whole dispatch falls back to the 8 B
    wire and stays exact."""
    net = _net()
    params = _params(layers_dict(DSL), rng)
    a = _stream(rng, CAP)
    b = _stream(rng, CAP)
    b[:, 2] = np.arange(CAP, dtype=np.int32) * 70000  # span >> 2**16
    want_a, = _oracle(net, params, [a])
    want_b, = _oracle(net, params, [b])
    pipe = StreamingPipeline(net, params, capacity=CAP, streams=2)
    got = list(pipe.serve([a, b]))
    outs = np.asarray(got[0].outputs)
    np.testing.assert_allclose(outs[0], want_a, rtol=0, atol=1e-6)
    np.testing.assert_allclose(outs[1], want_b, rtol=0, atol=1e-6)


def test_pipeline_prepacked_mixed_group_unifies(rng):
    """A PRE-packed multi-stream group with mixed compact/plain arity
    (one producer's slab overflowed the compact ts field) must unify to
    the plain wire exactly — a long-running deployment must not crash on
    one sparse segment (this used to raise)."""
    net = _net()
    params = _params(layers_dict(DSL), rng)
    a = _stream(rng, CAP)
    b = _stream(rng, CAP)
    b[:, 2] = np.arange(CAP, dtype=np.int32) * 70000
    want_a, = _oracle(net, params, [a])
    want_b, = _oracle(net, params, [b])
    pipe = StreamingPipeline(net, params, capacity=CAP, streams=2)
    got = list(pipe.serve([pipe.pack(a), pipe.pack(b)]))  # pre-packed
    outs = np.asarray(got[0].outputs)
    np.testing.assert_allclose(outs[0], want_a, rtol=0, atol=1e-6)
    np.testing.assert_allclose(outs[1], want_b, rtol=0, atol=1e-6)


def test_pipeline_wire_format_switch_is_monotone(rng):
    """Single stream: once one dispatch has gone plain, later
    compact-able dispatches convert too (at most two compiled programs
    per run instead of per-item format flip-flop), all exact."""
    net = _net()
    params = _params(layers_dict(DSL), rng)
    items = [_stream(rng, CAP) for _ in range(3)]
    items[1][:, 2] = np.arange(CAP, dtype=np.int32) * 70000  # overflows
    want = _oracle(net, params, items)
    pipe = StreamingPipeline(net, params, capacity=CAP)
    assert not pipe._seen_plain
    got = list(pipe.serve(list(items)))
    assert pipe._seen_plain
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g.outputs), w,
                                   rtol=0, atol=1e-6)


def test_pipeline_unequal_chunk_counts_raise(rng):
    net = _net()
    params = _params(layers_dict(DSL), rng)
    pipe = StreamingPipeline(net, params, capacity=CAP, streams=2)
    with pytest.raises(ValueError, match="equally many chunks"):
        list(pipe.serve([_stream(rng, CAP), _stream(rng, 2 * CAP)]))


def test_threaded_source_delivers_everything(rng):
    items = [np.full((4, 3), i, np.int32) for i in range(20)]
    got = list(threaded_source(lambda: iter(items), depth=3, threads=2))
    assert len(got) == 20
    seen = sorted(int(a[0, 0]) for a in got)
    assert seen == list(range(20))


def test_pipeline_mesh_sharded_matches_unsharded(rng):
    """Mesh serving (stream axis over 'data', channels over 'model') is
    one GSPMD program per dispatch and must be allclose to the unsharded
    multi-stream pipeline on the same source."""
    from async_ev_cnn_tpu.parallel import make_mesh

    assert jax.device_count() == 8
    net = _net()
    params = _params(layers_dict(DSL), rng)
    items = [_stream(rng, CAP) for _ in range(8)]  # 2 dispatches x 4 streams

    ref_pipe = StreamingPipeline(net, params, capacity=CAP, streams=4)
    want = list(ref_pipe.serve(list(items)))

    mesh = make_mesh(n_data=4, n_model=2)
    pipe = StreamingPipeline(net, params, capacity=CAP, streams=4, mesh=mesh)
    got = list(pipe.serve(list(items)))

    assert len(got) == len(want) == 2
    for g, w in zip(got, want):
        assert g.n_events == w.n_events
        np.testing.assert_allclose(np.asarray(g.outputs),
                                   np.asarray(w.outputs), rtol=0, atol=1e-5)
    # mid-stream state agrees too (it is the carried operand)
    for a, b in zip(jax.tree.leaves(pipe.state),
                    jax.tree.leaves(ref_pipe.state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5)


def test_pipeline_mesh_requires_divisible_streams(rng):
    from async_ev_cnn_tpu.parallel import make_mesh

    net = _net()
    params = _params(layers_dict(DSL), rng)
    with pytest.raises(ValueError, match="divisible"):
        StreamingPipeline(net, params, capacity=CAP, streams=3,
                          mesh=make_mesh(n_data=4, n_model=2))


def test_threaded_source_propagates_worker_errors(rng):
    """A failing transform (e.g. a corrupt file in the decode stage) must
    surface in the consumer, not silently truncate the stream."""

    def bad(i):
        if i == 5:
            raise RuntimeError("decode failed on item 5")
        return np.full((4, 3), i, np.int32)

    with pytest.raises(RuntimeError, match="item 5"):
        list(threaded_source(lambda: iter(range(20)), fn=bad,
                             depth=3, threads=2))
