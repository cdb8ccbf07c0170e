"""Gates for the Pallas surface-scan kernel (ops/pallas_scan.py).

The kernel claims BIT-IDENTICAL surfaces to iterating ``integrate_step``
(same op order, same snap fences) — assert exact equality, not allclose.
Runs in interpret mode on the CPU test backend.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from async_ev_cnn_tpu.layers.types import EventChunk
from async_ev_cnn_tpu.ops.integrate import (
    chunk_ts_maps,
    integrate_parallel,
    integrate_step,
)
from async_ev_cnn_tpu.ops.pallas_scan import surface_scan_pallas


def _chunks(rng, t, e, h, w, occupancy=0.8):
    n = t * e
    ts = np.cumsum(rng.randint(1, 40, n)).astype(np.int32).reshape(t, e)
    y = rng.randint(0, h, (t, e)).astype(np.int32)
    x = rng.randint(0, w, (t, e)).astype(np.int32)
    p = rng.randint(0, 2, (t, e)).astype(np.int32)
    valid = rng.rand(t, e) < occupancy
    valid[:, 0] = True  # no fully-empty chunks in this helper
    return EventChunk(
        y=jnp.asarray(y), x=jnp.asarray(x), ts=jnp.asarray(ts),
        p=jnp.asarray(p), valid=jnp.asarray(valid),
    )


def _sequential_surfaces(surface, prev_ts, chunks, leak):
    outs = []
    s, pts = surface, prev_ts
    t = int(chunks.y.shape[0])
    for i in range(t):
        if s.shape[0] == 1:
            s2, pts, _, _ = integrate_step(
                s[0], pts, chunks.y[i], chunks.x[i], chunks.ts[i],
                chunks.valid[i], leak,
            )
            s = s2[None]
        else:
            s, pts, _, _ = integrate_step(
                s, pts, chunks.y[i], chunks.x[i], chunks.ts[i],
                chunks.valid[i], leak, p=chunks.p[i],
            )
        outs.append(np.asarray(s))
    return np.stack(outs)


@pytest.mark.parametrize("channels", [1, 2])
@pytest.mark.parametrize("shape", [(13, 17), (16, 16)])
def test_kernel_bit_exact_vs_sequential(rng, channels, shape):
    """Unaligned spatial shapes exercise the pixel padding; T=10 with
    TB=8 exercises the time padding; 2 channels the CHW flattening."""
    h, w = shape
    leak = 3e-3
    chunks = _chunks(rng, 10, 12, h, w)
    surface = jnp.asarray(
        np.round(rng.rand(channels, h, w) * 2**20).astype(np.float32) / 2**20
    )
    prev_ts = jnp.int32(5)

    ref = _sequential_surfaces(surface, prev_ts, chunks, leak)
    ts_map, d, last_ts = chunk_ts_maps(
        channels, h, w, prev_ts, chunks, leak
    )
    got = surface_scan_pallas(
        surface, ts_map, d, last_ts, leak, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), ref)


@pytest.mark.parametrize("channels", [1, 2])
@pytest.mark.parametrize("shape", [(13, 17), (16, 16)])
def test_events_kernel_bit_exact_vs_sequential(rng, channels, shape):
    """The event-scatter kernel (one-hot MXU placement of per-event limb
    payloads) against the sequential integrate_step chain — exact equality.
    Unaligned shapes exercise pixel padding; E=12 exercises the event-axis
    padding to a lane multiple; 2 channels the CHW flattening (polarity
    routes each event into its channel plane)."""
    from async_ev_cnn_tpu.ops.integrate import chunk_event_updates
    from async_ev_cnn_tpu.ops.pallas_scan import surface_scan_events_pallas

    h, w = shape
    leak = 3e-3
    chunks = _chunks(rng, 10, 12, h, w)
    surface = jnp.asarray(
        np.round(rng.rand(channels, h, w) * 2**20).astype(np.float32) / 2**20
    )
    prev_ts = jnp.int32(5)

    ref = _sequential_surfaces(surface, prev_ts, chunks, leak)
    pix_r, pix_c, dt, d, last_ts = chunk_event_updates(
        channels, h, w, prev_ts, chunks, leak
    )
    got = surface_scan_events_pallas(
        surface, pix_r, pix_c, dt, d, leak, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_events_kernel_duplicates_and_ts_ties(rng):
    """In-chunk duplicate pixels: the reference's fancy-index += makes the
    LAST occurrence win (integration.py:71) = max-(ts, index) event; equal
    timestamps at the same pixel tie-break by position.  The XLA-side
    dedup must hand the kernel exactly one winner per pixel — two winners
    would double-add through the one-hot sums."""
    h, w = 11, 9
    leak = 2e-3
    # every event in chunk 0 hits pixel (3, 4); ts ties included
    y = np.full((2, 6), 3, np.int32)
    x = np.full((2, 6), 4, np.int32)
    ts = np.array([[7, 9, 9, 9, 8, 7], [12, 12, 15, 15, 15, 13]], np.int32)
    chunks = EventChunk(
        y=jnp.asarray(y), x=jnp.asarray(x), ts=jnp.asarray(ts),
        p=jnp.zeros((2, 6), jnp.int32), valid=jnp.ones((2, 6), bool),
    )
    surface = jnp.asarray(
        np.round(rng.rand(1, h, w) * 2**20).astype(np.float32) / 2**20
    )
    ref = _sequential_surfaces(surface, jnp.int32(0), chunks, leak)
    from async_ev_cnn_tpu.ops.integrate import chunk_event_updates
    from async_ev_cnn_tpu.ops.pallas_scan import surface_scan_events_pallas

    pix_r, pix_c, dt, d, _ = chunk_event_updates(1, h, w, jnp.int32(0),
                                                 chunks, leak)
    # exactly one winner per chunk survives the dedup
    np.testing.assert_array_equal((np.asarray(pix_r) >= 0).sum(axis=1), [1, 1])
    got = surface_scan_events_pallas(
        surface, pix_r, pix_c, dt, d, leak, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_events_kernel_large_dt_limbs(rng):
    """dt >= 2^24 exercises limb 3 and the int32->f32 rounding, which must
    match the ts-map path's identical conversion bit-for-bit."""
    h, w = 8, 8
    leak = 1e-9
    t, e = 3, 4
    # dt = last_ts[t] - ts is WITHIN-chunk: spread each chunk's events over
    # a huge ts range so dt spans all four limbs (up to ~2^30)
    spread = np.array([0, 255, 2**24 + 5, 2**31 - 20], np.int64)
    base = np.array([0, 7, 13], np.int64)
    ts = (base[:, None] + spread[None, :]).astype(np.int32)
    y = rng.randint(0, h, (t, e)).astype(np.int32)
    x = rng.randint(0, w, (t, e)).astype(np.int32)
    chunks = EventChunk(
        y=jnp.asarray(y), x=jnp.asarray(x), ts=jnp.asarray(ts),
        p=jnp.zeros((t, e), jnp.int32), valid=jnp.ones((t, e), bool),
    )
    surface = jnp.asarray(
        np.round(rng.rand(1, h, w) * 2**20).astype(np.float32) / 2**20
    )
    ref = _sequential_surfaces(surface, jnp.int32(0), chunks, leak)
    from async_ev_cnn_tpu.ops.integrate import chunk_event_updates
    from async_ev_cnn_tpu.ops.pallas_scan import surface_scan_events_pallas

    pix_r, pix_c, dt, d, _ = chunk_event_updates(1, h, w, jnp.int32(0),
                                                 chunks, leak)
    assert int(np.asarray(dt).max()) >= 2**30  # limb 3 genuinely exercised
    got = surface_scan_events_pallas(
        surface, pix_r, pix_c, dt, d, leak, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_events_engine_matches_tsmap_engine(rng):
    """The two Pallas engines are both bit-identical to the sequential
    chain, hence to each other."""
    h, w = 16, 24
    leak = 1e-3
    chunks = _chunks(rng, 12, 16, h, w)
    surface = jnp.asarray(rng.rand(1, h, w).astype(np.float32))
    s_e, lt_e = integrate_parallel(surface, jnp.int32(0), chunks, leak,
                                   engine="pallas")
    s_t, lt_t = integrate_parallel(surface, jnp.int32(0), chunks, leak,
                                   engine="pallas_tsmap")
    np.testing.assert_array_equal(np.asarray(s_e), np.asarray(s_t))
    np.testing.assert_array_equal(np.asarray(lt_e), np.asarray(lt_t))


def test_engine_pallas_vs_xla(rng):
    """The two integrate_parallel engines agree to the snap grid (the xla
    engine regroups the max-plus algebra; ~1 ulp)."""
    h, w = 16, 24
    leak = 1e-3
    chunks = _chunks(rng, 12, 16, h, w)
    surface = jnp.asarray(rng.rand(1, h, w).astype(np.float32))
    prev_ts = jnp.int32(0)
    s_p, lt_p = integrate_parallel(surface, prev_ts, chunks, leak,
                                   engine="pallas")
    s_x, lt_x = integrate_parallel(surface, prev_ts, chunks, leak,
                                   engine="xla")
    np.testing.assert_array_equal(np.asarray(lt_p), np.asarray(lt_x))
    np.testing.assert_allclose(
        np.asarray(s_p), np.asarray(s_x), atol=1e-6, rtol=0
    )


def test_engine_pallas_under_vmap(rng):
    """Multi-stream serving vmaps scan_parallel; the kernel must map."""
    h, w = 8, 16
    leak = 2e-3
    s0 = jnp.asarray(rng.rand(3, 1, h, w).astype(np.float32))
    all_chunks = [_chunks(rng, 6, 8, h, w) for _ in range(3)]
    chunks = jax.tree.map(lambda *xs: jnp.stack(xs), *all_chunks)
    pts = jnp.zeros((3,), jnp.int32)

    def one(surface, prev_ts, cs):
        return integrate_parallel(surface, prev_ts, cs, leak,
                                  engine="pallas")

    s_v, lt_v = jax.vmap(one)(s0, pts, chunks)
    for i in range(3):
        s_i, lt_i = one(s0[i], pts[i], all_chunks[i])
        np.testing.assert_array_equal(np.asarray(s_v[i]), np.asarray(s_i))
        np.testing.assert_array_equal(np.asarray(lt_v[i]), np.asarray(lt_i))


def test_engine_pallas_with_ts_window(rng):
    """ts_window changes only the ts-map construction of the ts-map engine;
    the kernel consumes it unchanged and must stay bit-exact vs the full
    compare.  (The event-scatter 'pallas' engine ignores ts_window — the
    compare it optimizes does not exist there.)"""
    h, w = 16, 16
    leak = 1e-3
    t, e = 6, 8
    # clustered events that fit an 8x8 window
    y = (4 + rng.randint(0, 6, (t, e))).astype(np.int32)
    x = (4 + rng.randint(0, 6, (t, e))).astype(np.int32)
    ts = np.cumsum(rng.randint(1, 20, t * e)).astype(np.int32).reshape(t, e)
    chunks = EventChunk(
        y=jnp.asarray(y), x=jnp.asarray(x), ts=jnp.asarray(ts),
        p=jnp.zeros((t, e), jnp.int32), valid=jnp.ones((t, e), bool),
    )
    surface = jnp.asarray(rng.rand(1, h, w).astype(np.float32))
    s_w, _ = integrate_parallel(surface, jnp.int32(0), chunks, leak,
                                ts_window=(8, 8), engine="pallas_tsmap")
    s_f, _ = integrate_parallel(surface, jnp.int32(0), chunks, leak,
                                engine="pallas_tsmap")
    np.testing.assert_array_equal(np.asarray(s_w), np.asarray(s_f))


def test_scan_parallel_engine_plumbs_through(rng):
    """EventNetwork.scan_parallel(integrate_engine='pallas') matches the
    default xla engine end-to-end on CPU."""
    from collections import OrderedDict

    from async_ev_cnn_tpu.layers.network import EventNetwork

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
                       padding="SAME", conv_mode="full")
    chunks = _chunks(rng, 9, 10, 16, 16)
    state = net.init_state(params)
    st_p, outs_p = net.scan_parallel(params, state, chunks,
                                     integrate_engine="pallas")
    st_x, outs_x = net.scan_parallel(params, state, chunks,
                                     integrate_engine="xla")
    np.testing.assert_allclose(
        np.asarray(outs_p), np.asarray(outs_x), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(st_p[0].surface), np.asarray(st_x[0].surface),
        atol=1e-6, rtol=0,
    )
    # windowed time axis with the pallas engine
    st_w, outs_w = net.scan_parallel(params, state, chunks, window=4,
                                     integrate_engine="pallas")
    np.testing.assert_allclose(
        np.asarray(outs_w), np.asarray(outs_p), atol=1e-5, rtol=1e-5
    )


def test_bad_engine_rejected(rng):
    chunks = _chunks(rng, 2, 4, 8, 8)
    surface = jnp.zeros((1, 8, 8), jnp.float32)
    with pytest.raises(ValueError, match="engine"):
        integrate_parallel(surface, jnp.int32(0), chunks, 1e-3,
                           engine="nope")


def test_kernel_identity_on_empty_chunks(rng):
    """All-invalid chunks (empty µs time bins) are exact identity steps:
    last_ts holds, d = 0, no event lands — the surfaces must equal the
    incoming surface bit-for-bit at every such step."""
    h, w = 8, 16
    t, e = 5, 6
    chunks = EventChunk(
        y=jnp.zeros((t, e), jnp.int32), x=jnp.zeros((t, e), jnp.int32),
        ts=jnp.zeros((t, e), jnp.int32), p=jnp.zeros((t, e), jnp.int32),
        valid=jnp.zeros((t, e), bool),
    )
    surface = jnp.asarray(
        np.round(rng.rand(1, h, w) * 2**20).astype(np.float32) / 2**20
    )
    s, lt = integrate_parallel(surface, jnp.int32(42), chunks, 1e-3,
                               engine="pallas")
    np.testing.assert_array_equal(
        np.asarray(s), np.broadcast_to(np.asarray(surface), (t, 1, h, w))
    )
    np.testing.assert_array_equal(np.asarray(lt), np.full(t, 42, np.int32))
