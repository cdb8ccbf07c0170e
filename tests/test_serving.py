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


@pytest.mark.parametrize("wire",
                         ["auto", "ultra4", "ultra", "compact", "plain"])
@pytest.mark.parametrize("max_in_flight", [1, 3])
def test_pipeline_matches_scan_parallel(rng, wire, max_in_flight):
    net = _net()
    params = _params(layers_dict(DSL), rng)
    # contiguous stream split into 6 dispatch items, 2 chunks each
    items = [_stream(rng, 2 * CAP) for _ in range(6)]
    if wire == "ultra4":  # the pinned 2.5 B tier needs gaps < 16 µs
        for ev in items:
            ev[:, 2] = np.cumsum(rng.randint(1, 16, 2 * CAP))
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


def test_pipeline_multistream_overrides_auto_fusion(rng):
    """streams > 1 flips a stem_fusion='auto' net to unfused: 'auto'
    means the measured winner for the execution shape, and under the
    vmapped multi-stream shape the single-stream-measured fusion
    regresses 28-40% on chip (2026-08-19 capture, docs/performance.md
    "Stem fusion x vmapped serving").  Explicit True/False and the
    single-stream shape are untouched."""
    params = _params(layers_dict(DSL), rng)
    net = _net()  # default stem_fusion='auto'
    assert net._stem_fusion == "auto"
    multi = StreamingPipeline(net, params, capacity=CAP, streams=2)
    assert multi._net._stem_fusion is False
    assert net._stem_fusion == "auto"  # caller's net untouched
    single = StreamingPipeline(net, params, capacity=CAP)
    assert single._net._stem_fusion == "auto"
    forced = EventNetwork(layers_dict(DSL), H, W, leak=1e-4, alpha=0.1,
                          padding="SAME", conv_mode="full",
                          stem_fusion=True)
    pinned = StreamingPipeline(forced, params, capacity=CAP, streams=2)
    assert pinned._net._stem_fusion is True


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


def test_pipeline_multistream_ultra4_exact(rng):
    """streams=2 where both items fit the 2.5 B ultra4 tier: the stacked
    [S, T, ceil(E/2)] nibble plane classifies and unpacks correctly and
    every stream matches its independent chain; the dispatch's wire
    bytes reflect the tier."""
    net = _net()
    params = _params(layers_dict(DSL), rng)
    a, b = _stream(rng, CAP), _stream(rng, CAP)
    a[:, 2] = np.cumsum(rng.randint(1, 16, CAP))
    b[:, 2] = np.cumsum(rng.randint(1, 16, CAP))
    want_a, = _oracle(net, params, [a])
    want_b, = _oracle(net, params, [b])
    pipe = StreamingPipeline(net, params, capacity=CAP, streams=2)
    got = list(pipe.serve([a, b]))
    outs = np.asarray(got[0].outputs)
    np.testing.assert_allclose(outs[0], want_a, rtol=0, atol=1e-6)
    np.testing.assert_allclose(outs[1], want_b, rtol=0, atol=1e-6)
    # 2 streams x (CAP*2.5 B planes + 8 B base/counts)
    assert pipe.stats["wire_bytes"] <= 2 * (CAP * 2.5 + 8)


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
    lower-tier-able dispatches convert too (at most one compiled program
    per tier era instead of per-item format flip-flop), all exact."""
    from async_ev_cnn_tpu.utils.wire import WIRE_TIERS

    net = _net()
    params = _params(layers_dict(DSL), rng)
    items = [_stream(rng, CAP) for _ in range(3)]
    items[1][:, 2] = np.arange(CAP, dtype=np.int32) * 70000  # overflows
    want = _oracle(net, params, items)
    pipe = StreamingPipeline(net, params, capacity=CAP)
    assert pipe._era == WIRE_TIERS["ultra4"]
    got = list(pipe.serve(list(items)))
    assert pipe._era == WIRE_TIERS["plain"]
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g.outputs), w,
                                   rtol=0, atol=1e-6)


def test_pipeline_wire_tier_ladder_is_exact(rng):
    """auto walks the tier ladder as the stream's statistics degrade —
    2.5 B ultra4 (gaps < 16 µs) -> 3 B ultra (one 16-255 µs gap) ->
    4 B compact (one 300 µs gap) -> 8 B plain (chunk span past u16) —
    never dropping back, with every dispatch exact vs the direct
    scan_parallel chain and the wire bytes shrinking monotonically with
    the tier."""
    from async_ev_cnn_tpu.utils.wire import WIRE_TIERS

    net = _net()
    params = _params(layers_dict(DSL), rng)
    items = [_stream(rng, CAP) for _ in range(6)]
    items[0][:, 2] = np.cumsum(rng.randint(1, 16, CAP))   # ultra4 fits
    items[1][CAP // 2:, 2] += 100        # mid-chunk gap in [16, 256)
    items[2][CAP // 2:, 2] += 300        # mid-chunk gap >= 256 µs
    items[4][:, 2] = np.arange(CAP, dtype=np.int32) * 70000  # span > u16
    want = _oracle(net, params, items)
    # max_in_flight=1 yields each dispatch immediately, so the era is
    # observable per dispatch instead of only after the drain
    pipe = StreamingPipeline(net, params, capacity=CAP, max_in_flight=1)
    eras = []
    for g, w in zip(pipe.serve(list(items)), want):
        np.testing.assert_allclose(np.asarray(g.outputs), w,
                                   rtol=0, atol=1e-6)
        eras.append(pipe._era)
    assert eras == sorted(eras), "tier era regressed mid-stream"
    assert eras[0] == WIRE_TIERS["ultra4"]
    assert WIRE_TIERS["ultra"] in eras and WIRE_TIERS["compact"] in eras
    assert pipe._era == WIRE_TIERS["plain"]
    # per-event cost of the smallest tier: the first dispatch rode
    # ultra4 at 2.5 B/event
    first = StreamingPipeline(net, params, capacity=CAP, max_in_flight=1)
    list(first.serve([items[0]]))
    assert first._era == WIRE_TIERS["ultra4"]
    assert first.stats["wire_bytes"] <= CAP * 2.5 + 8


def test_pipeline_ultra_strict_raises_when_unfit(rng):
    net = _net()
    params = _params(layers_dict(DSL), rng)
    bad = _stream(rng, CAP)
    bad[:, 2] = np.arange(CAP, dtype=np.int32) * 300  # every gap >= 256
    pipe = StreamingPipeline(net, params, capacity=CAP, wire="ultra")
    with pytest.raises(ValueError, match="ultra"):
        list(pipe.serve([bad]))


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


def test_pipeline_polarity_matches_direct(rng):
    """serve with keep_polarity: a 2-channel (ON/OFF) network fed 4-column
    events through the wire must EXACTLY match scan_parallel over the
    same polarity-carrying chunks — for both wire formats (compact grows
    a bit-packed plane; plain steals bit 31)."""
    dsl = "conv1=3,3,2,4 pool1=2,2 conv2=1,1,4,6"
    net = EventNetwork(layers_dict(dsl), H, W, leak=1e-4, alpha=0.1,
                       padding="SAME", conv_mode="full")
    params = _params(layers_dict(dsl), rng)
    items = []
    t0 = 0
    for _ in range(3):
        ev = _stream(rng, 2 * CAP)
        ev[:, 2] += t0
        t0 = int(ev[-1, 2]) + 1
        p = rng.randint(0, 2, ev.shape[0]).astype(np.int32)
        items.append(np.concatenate([ev, p[:, None]], axis=1))

    import jax.numpy as jnp

    jparams = {k: jnp.asarray(v) for k, v in params.items()}
    state = net.init_state(jparams)
    want = []
    for ev in items:
        state, o = jax.jit(
            lambda s, c: net.scan_parallel(jparams, s, c)
        )(state, pack_chunks(ev, CAP))
        want.append(np.asarray(o))

    for wire in ("compact", "plain"):
        pipe = StreamingPipeline(net, params, capacity=CAP, wire=wire,
                                 keep_polarity=True)
        got = list(pipe.serve(list(items)))
        assert len(got) == len(want)
        for res, ref in zip(got, want):
            np.testing.assert_allclose(np.asarray(res.outputs), ref,
                                       rtol=0, atol=1e-6)


def test_pipeline_polarity_requires_two_channels(rng):
    net = _net()  # 1-channel
    params = _params(layers_dict(DSL), rng)
    with pytest.raises(ValueError, match="2-channel"):
        StreamingPipeline(net, params, capacity=CAP, keep_polarity=True)


def test_pipeline_rebase_is_exact_within_int32(rng):
    """A stream whose relative clock crosses the 2**30 µs rebase
    threshold but stays inside int32: the rebasing pipeline must be
    EXACTLY equal to the direct (unrebased) scan_parallel chain — the
    rebase is a pure time-base shift, integrate arithmetic sees only
    differences."""
    net = _net()
    params = _params(layers_dict(DSL), rng)
    # 5 items; uniform steps in [0.2, 0.42] * 2**30 / CAP guarantee the
    # total lands in (2**30, 2**31): min 5*0.2*2**30, max 5*0.42*2**30
    items = []
    t0 = 0
    lo, hi = int(0.2 * 2**30 / CAP), int(0.42 * 2**30 / CAP)
    for _ in range(5):
        steps = rng.randint(lo, hi, CAP).astype(np.int64)
        ts = t0 + np.cumsum(steps)
        t0 = int(ts[-1]) + 1
        y = rng.randint(0, H, CAP).astype(np.int64)
        x = rng.randint(0, W, CAP).astype(np.int64)
        items.append(np.stack([y, x, ts], axis=-1))
    assert items[-1][-1, 2] < 2**31 - 1
    assert items[-1][-1, 2] > 2**30  # the rebase must actually trigger

    want = _oracle(net, params, [ev.astype(np.int32) for ev in items])

    pipe = StreamingPipeline(net, params, capacity=CAP)
    got = list(pipe.serve(list(items)))
    assert pipe._epochs[0] > 0, "rebase did not trigger"
    for res, ref in zip(got, want):
        np.testing.assert_allclose(np.asarray(res.outputs), ref,
                                   rtol=0, atol=0)  # bit-exact


def test_pipeline_rebase_endless_stream_past_int32(rng):
    """An endless-feed stream whose absolute clock runs past 2**31 µs
    (and 2**32): serve keeps running via per-stream rebasing.  Items are
    separated by huge silent gaps (leak fully zeroes the surface), so
    each dispatch must equal a FRESH pipeline over that item alone —
    the oracle for the saturating-floor path."""
    net = _net()
    params = _params(layers_dict(DSL), rng)
    base_items = [_stream(rng, CAP) for _ in range(5)]
    long_items = []
    t0 = np.int64(2**31 + 12345)  # starts already past int32
    for ev in base_items:
        ev64 = ev.astype(np.int64)
        ev64[:, 2] += t0 - ev64[0, 2]
        t0 = ev64[-1, 2] + 7 * 10**8  # ~11.7 min silent gap; leak 1e-4
        long_items.append(ev64)
    assert long_items[-1][-1, 2] > 2**32

    want = []
    for ev in base_items:
        fresh = StreamingPipeline(net, params, capacity=CAP)
        ev0 = ev.copy()
        ev0[:, 2] -= ev0[0, 2] - 1  # rebased to ~0, same differences
        want.append(np.asarray(list(fresh.serve([ev0]))[0].outputs))

    pipe = StreamingPipeline(net, params, capacity=CAP)
    got = list(pipe.serve(long_items))
    assert pipe._epochs[0] > 2**32
    for res, ref in zip(got, want):
        np.testing.assert_allclose(np.asarray(res.outputs), ref,
                                   rtol=0, atol=1e-6)


def test_pipeline_rebased_stream_rejects_prepacked(rng):
    net = _net()
    params = _params(layers_dict(DSL), rng)
    pipe = StreamingPipeline(net, params, capacity=CAP)
    far = _stream(rng, CAP).astype(np.int64)
    far[:, 2] += 2**30  # triggers a rebase
    list(pipe.serve([far]))
    assert pipe._epochs[0] > 0
    with pytest.raises(ValueError, match="rebased time base"):
        list(pipe.serve([pipe.pack(_stream(rng, CAP))]))


def test_pipeline_multistream_rebase_per_stream_epochs(rng):
    """streams=2 with DIFFERENT clock rates: the per-stream ``[2, S]``
    rebase-delta path (untested by the single-stream rebase gates, which
    exercise the scalar ``[2]`` shape) must shift each stream's time
    base independently.  Both streams stay inside int32 overall, so a
    rebase=False pipeline over the int32-cast items is a bit-exact
    oracle that isolates exactly the rebase machinery — same vmap, same
    wire, only the deltas differ."""
    net = _net()
    params = _params(layers_dict(DSL), rng)

    def make(scale, n_items=5):
        # steps uniform in [0.9, 1.0] * scale * 2**30 / CAP, so each
        # item's span is tightly ~0.95 * scale * 2**30
        items, t0 = [], 0
        span = int(scale * 2**30)
        for _ in range(n_items):
            steps = rng.randint(int(0.9 * span / CAP), span // CAP,
                                CAP).astype(np.int64)
            ts = t0 + np.cumsum(steps)
            t0 = int(ts[-1]) + 1
            y = rng.randint(0, H, CAP).astype(np.int64)
            x = rng.randint(0, W, CAP).astype(np.int64)
            items.append(np.stack([y, x, ts], axis=-1))
        return items

    a = make(0.38)  # crosses 2**30 at item 3 (cum in [1.03, 1.14])
    b = make(0.24)  # crosses at item 5 — different epochs per slot
    for seq in (a, b):
        assert seq[-1][-1, 2] < 2**31 - 1
        assert seq[-1][-1, 2] > 2**30

    interleaved = [x for pair in zip(a, b) for x in pair]
    oracle = StreamingPipeline(net, params, capacity=CAP, streams=2,
                               rebase=False)
    want = [np.asarray(r.outputs) for r in oracle.serve(
        [ev.astype(np.int32) for ev in interleaved])]

    pipe = StreamingPipeline(net, params, capacity=CAP, streams=2)
    got = list(pipe.serve(interleaved))
    assert pipe._epochs[0] > 0 and pipe._epochs[1] > 0
    assert pipe._epochs[0] != pipe._epochs[1]
    for res, ref in zip(got, want):
        np.testing.assert_allclose(np.asarray(res.outputs), ref,
                                   rtol=0, atol=0)  # bit-exact


def test_pipeline_latency_stats(rng):
    """latency_stats(): per-dispatch p50/p95/p99 and event-age after a
    serve run — the serving observability the reference's per-step
    prints provided (runner.py:92-96)."""
    net = _net()
    params = _params(layers_dict(DSL), rng)
    pipe = StreamingPipeline(net, params, capacity=CAP)
    assert pipe.latency_stats() == {"n": 0}
    items = [_stream(rng, CAP) for _ in range(4)]
    t0 = 0
    for ev in items:
        ev[:, 2] += t0
        t0 = int(ev[-1, 2]) + 1
    list(pipe.serve(items))
    stats = pipe.latency_stats()
    assert stats["n"] == 4
    lat = stats["dispatch_latency_ms"]
    age = stats["event_age_ms"]
    for q in (lat, age):
        assert 0 <= q["p50"] <= q["p95"] <= q["p99"] <= q["max"]
    # age includes host pack + queueing, so it dominates latency
    assert age["p50"] >= lat["p50"]


def test_prepared_item_age_counts_queue_residency(rng):
    """A PreparedItem's events exist from prepare() — event_age must
    count the producer-queue residency between prepare and serve, not
    restart at the serve loop's pop (which collapses the stat to
    ~dispatch latency for the recommended prepared-source shape)."""
    import time as _time

    net = _net()
    params = _params(layers_dict(DSL), rng)
    pipe = StreamingPipeline(net, params, capacity=CAP)
    ev = _stream(rng, CAP)
    item = pipe.prepare(ev)
    assert item.t_created is not None
    _time.sleep(0.2)  # queue residency the age stat must not lose
    list(pipe.serve([item]))
    stats = pipe.latency_stats()
    age = stats["event_age_ms"]["p50"]
    lat = stats["dispatch_latency_ms"]["p50"]
    assert age >= lat + 150  # the 200 ms residency shows up in age
    # hand-built items without a timestamp keep the pop-time fallback
    from async_ev_cnn_tpu.utils.serving import PreparedItem

    bare = PreparedItem(item.wire, item.deltas)
    assert bare.t_created is None


def test_dispatch_result_counts_mark_padding(rng):
    """DispatchResult.counts exposes per-chunk valid-event counts so
    consumers can skip exact-no-op padding chunks (t_chunks padding used
    to produce phantom duplicate detections downstream)."""
    net = _net()
    params = _params(layers_dict(DSL), rng)
    pipe = StreamingPipeline(net, params, capacity=CAP, t_chunks=4)
    got = list(pipe.serve([_stream(rng, 2 * CAP)]))  # 2 real chunks of 4
    counts = np.asarray(got[0].counts)
    assert counts.shape == (4,)
    assert counts[0] == CAP and counts[1] == CAP
    assert counts[2] == 0 and counts[3] == 0


def test_pipeline_prepare_matches_raw_path(rng):
    """prepare() (producer-side rebase + pack) must be EXACTLY the raw
    path: a rebasing stream served as PreparedItems equals the direct
    unrebased oracle, the epochs advance identically, and — unlike a
    bare wire tuple — a PreparedItem is accepted after the rebase."""
    net = _net()
    params = _params(layers_dict(DSL), rng)
    # same construction as the within-int32 rebase gate: crosses 2**30
    items = []
    t0 = 0
    lo, hi = int(0.2 * 2**30 / CAP), int(0.42 * 2**30 / CAP)
    for _ in range(5):
        steps = rng.randint(lo, hi, CAP).astype(np.int64)
        ts = t0 + np.cumsum(steps)
        t0 = int(ts[-1]) + 1
        y = rng.randint(0, H, CAP).astype(np.int64)
        x = rng.randint(0, W, CAP).astype(np.int64)
        items.append(np.stack([y, x, ts], axis=-1))
    assert items[-1][-1, 2] > 2**30

    want = _oracle(net, params, [ev.astype(np.int32) for ev in items])

    raw = StreamingPipeline(net, params, capacity=CAP)
    list(raw.serve(list(items)))
    pipe = StreamingPipeline(net, params, capacity=CAP)
    prepared = [pipe.prepare(ev) for ev in items]  # producer-side
    got = list(pipe.serve(prepared))
    assert pipe._epochs == raw._epochs
    assert pipe._epochs[0] > 0, "rebase did not trigger"
    for res, ref in zip(got, want):
        np.testing.assert_allclose(np.asarray(res.outputs), ref,
                                   rtol=0, atol=0)  # bit-exact


def test_pipeline_prepare_multistream(rng):
    """streams=2 PreparedItems with per-slot prepare(stream=s): each
    stream's epoch advances independently and the dispatches equal the
    raw-array path bit-exactly."""
    net = _net()
    params = _params(layers_dict(DSL), rng)

    def make(scale):
        out, t0 = [], 0
        for _ in range(4):
            steps = rng.randint(1, 50, CAP).astype(np.int64) * scale
            ts = t0 + np.cumsum(steps)
            t0 = int(ts[-1]) + 1
            y = rng.randint(0, H, CAP).astype(np.int64)
            x = rng.randint(0, W, CAP).astype(np.int64)
            out.append(np.stack([y, x, ts], axis=-1))
        return out

    # b's items each span < int32 after rebase (~8e8 µs) but its clock
    # crosses 2**30 by the second item; a never rebases
    a, b = make(1), make(10**6)
    interleaved = [x for pair in zip(a, b) for x in pair]
    raw = StreamingPipeline(net, params, capacity=CAP, streams=2)
    want = [np.asarray(r.outputs) for r in raw.serve(list(interleaved))]

    pipe = StreamingPipeline(net, params, capacity=CAP, streams=2)
    prepared = [pipe.prepare(ev, stream=i % 2)
                for i, ev in enumerate(interleaved)]
    got = list(pipe.serve(prepared))
    assert pipe._epochs == raw._epochs
    assert pipe._epochs[1] > 0 and pipe._epochs[0] == 0
    for res, ref in zip(got, want):
        np.testing.assert_allclose(np.asarray(res.outputs), ref,
                                   rtol=0, atol=0)


def test_restored_state_raw_feed_at_huge_ts_saturates_cleanly(rng):
    """Rebase epochs are not part of the checkpointed state pytree (see
    the ``state`` setter docstring): a restored RAW feed whose absolute
    clock kept running across the restart triggers one capped rebase
    whose prev_ts shift saturates at the dispatch floor.  The contract:
    the first dispatch sees a >=17.9-min apparent gap (surfaces fully
    leak-decay, as real downtime would) — equal to a FRESH pipeline over
    the item alone — never a wrapped/negative dt."""
    net = _net()
    params = _params(layers_dict(DSL), rng)

    pipe_a = StreamingPipeline(net, params, capacity=CAP)
    warm = _stream(rng, CAP).astype(np.int64)
    warm[:, 2] += 2**30  # cross the rebase threshold mid-stream
    list(pipe_a.serve([warm]))
    assert pipe_a._epochs[0] > 0
    saved = jax.tree.map(np.asarray, pipe_a.state)

    pipe_b = StreamingPipeline(net, params, capacity=CAP)  # epochs reset
    pipe_b.state = saved
    cont = _stream(rng, CAP).astype(np.int64)
    cont[:, 2] += 2**33  # the feed's absolute clock, post-restart
    got = np.asarray(list(pipe_b.serve([cont]))[0].outputs)

    fresh = StreamingPipeline(net, params, capacity=CAP)
    ev0 = cont.copy()
    ev0[:, 2] -= ev0[0, 2] - 1  # rebased to ~0, same differences
    want = np.asarray(list(fresh.serve([ev0]))[0].outputs)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_prepared_item_dropped_before_dispatch_is_absorbed(rng):
    """An item dropped between prepare() and dispatch (ragged
    multi-stream tail, consumer exiting serve() while the producer queue
    holds items) must NOT desynchronize the stream clock: prepare()
    advances the host epoch eagerly, but serve() derives the device
    ``prev_ts`` shift from the epoch ledger, so the next dispatched item
    carries any dropped item's shift.  Five prepared items where items
    1-4 each trigger a rebase; serving the [0, 2, 3, 4] subset (item 1's
    shift rides only inside the dropped item) must equal the raw-array
    path over the same subset bit-exactly."""
    net = _net()
    params = _params(layers_dict(DSL), rng)
    B = 2**30  # item k starts at k*2**30: every item from 1 on rebases
    items = []
    for k in range(5):
        steps = rng.randint(1, B // (2 * CAP), CAP).astype(np.int64)
        ts = k * B + np.cumsum(steps)
        y = rng.randint(0, H, CAP).astype(np.int64)
        x = rng.randint(0, W, CAP).astype(np.int64)
        items.append(np.stack([y, x, ts], axis=-1))

    pipe = StreamingPipeline(net, params, capacity=CAP)
    prepared = [pipe.prepare(ev) for ev in items]
    assert prepared[1].epoch > prepared[0].epoch  # item 1 rebased
    assert prepared[2].epoch > prepared[1].epoch  # and so did item 2

    served = [prepared[0]] + prepared[2:]  # item 1 dropped after prepare
    got = list(pipe.serve(served))
    assert pipe._applied_epochs[0] == prepared[-1].epoch

    raw = StreamingPipeline(net, params, capacity=CAP)
    want = list(raw.serve([items[0]] + items[2:]))
    for res, ref in zip(got, want):
        np.testing.assert_allclose(np.asarray(res.outputs),
                                   np.asarray(ref.outputs),
                                   rtol=0, atol=0)  # bit-exact


def test_prepared_item_cross_stream_raises(rng):
    """A shared multi-producer queue that delivers two items of the
    same stream adjacently must raise at the dispatch slot mismatch —
    not silently apply one stream's events (and rebase) to the other's
    vmapped state."""
    net = _net()
    params = _params(layers_dict(DSL), rng)
    pipe = StreamingPipeline(net, params, capacity=CAP, streams=2)
    a = pipe.prepare(_stream(rng, CAP), stream=0)
    b = pipe.prepare(_stream(rng, CAP), stream=0)
    with pytest.raises(ValueError, match="PreparedItem for stream 0"):
        list(pipe.serve([a, b]))


def test_prepared_item_out_of_order_raises(rng):
    """Rebased PreparedItems served out of prepare order regress the
    epoch ledger — a loud error, not a silently wrong prev_ts shift."""
    net = _net()
    params = _params(layers_dict(DSL), rng)
    pipe = StreamingPipeline(net, params, capacity=CAP)
    ev1 = _stream(rng, CAP).astype(np.int64)
    ev1[:, 2] += 2**30
    ev2 = _stream(rng, CAP).astype(np.int64)
    ev2[:, 2] += 2**31
    p1 = pipe.prepare(ev1)
    p2 = pipe.prepare(ev2)
    assert p2.epoch > p1.epoch > 0
    with pytest.raises(ValueError, match="regressed"):
        list(pipe.serve([p2, p1]))


def test_pack_respects_era_floor(rng):
    """Once serve() has promoted the tier era, pack() (and prepare())
    emit at the era's tier directly instead of packing low and paying
    the upconversion in the serial dispatch loop on every later item."""
    from async_ev_cnn_tpu.utils.wire import WIRE_TIERS, wire_format

    net = _net()
    params = _params(layers_dict(DSL), rng)
    pipe = StreamingPipeline(net, params, capacity=CAP)
    fits_ultra4 = _stream(rng, CAP)
    fits_ultra4[:, 2] = np.cumsum(rng.randint(1, 16, CAP))  # gaps < 16
    assert wire_format(pipe.pack(fits_ultra4)) == "ultra4"
    fits_ultra = _stream(rng, CAP)
    fits_ultra[CAP // 2:, 2] += 100  # one gap in [16, 256): ultra exactly
    assert wire_format(pipe.pack(fits_ultra)) == "ultra"
    overflowing = _stream(rng, CAP)
    overflowing[:, 2] = np.arange(CAP, dtype=np.int32) * 70000
    list(pipe.serve([overflowing]))  # promotes the era to plain
    assert pipe._era == WIRE_TIERS["plain"]
    assert wire_format(pipe.pack(fits_ultra)) == "plain"
    assert wire_format(pipe.prepare(fits_ultra).wire) == "plain"
    # pinned tiers ignore the era bookkeeping entirely
    pinned = StreamingPipeline(net, params, capacity=CAP, wire="ultra")
    pinned._era = WIRE_TIERS["plain"]
    assert wire_format(pinned.pack(fits_ultra)) == "ultra"
    pinned4 = StreamingPipeline(net, params, capacity=CAP, wire="ultra4")
    pinned4._era = WIRE_TIERS["plain"]
    assert wire_format(pinned4.pack(fits_ultra4)) == "ultra4"
    with pytest.raises(ValueError, match="ultra4"):
        pinned4.pack(fits_ultra)
