"""The compact wire format must round-trip exactly vs pack_chunks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from async_ev_cnn_tpu.utils.runner import pack_chunks
from async_ev_cnn_tpu.utils.wire import chunks_from_wire, pack_wire


def _stream(rng, n, h=160, w=224):
    y = rng.randint(0, h, n).astype(np.int32)
    x = rng.randint(0, w, n).astype(np.int32)
    ts = np.cumsum(rng.randint(1, 20, n)).astype(np.int32)
    return np.stack([y, x, ts], axis=-1)


def test_wire_roundtrip_matches_pack_chunks(rng):
    for n in (0, 1, 255, 256, 1000):
        events = _stream(rng, n)
        ref = pack_chunks(events, 256)
        yx, ts, counts = pack_wire(events, 256)
        assert yx.nbytes + ts.nbytes + counts.nbytes <= max(n, 1) * 8 + 256 * 8 + 4
        got = jax.jit(chunks_from_wire)(yx, ts, counts)
        np.testing.assert_array_equal(np.asarray(got.y), np.asarray(ref.y))
        np.testing.assert_array_equal(np.asarray(got.x), np.asarray(ref.x))
        np.testing.assert_array_equal(np.asarray(got.ts), np.asarray(ref.ts))
        np.testing.assert_array_equal(
            np.asarray(got.valid), np.asarray(ref.valid)
        )


def test_wire_high_coordinates_roundtrip(rng):
    """y, x in [2**15, 2**16) set the int32 sign bit in the packed word;
    the unpack must extract them logically (a bare arithmetic >> 16
    sign-extends and returns negative y — a silent surface corruption
    for any sensor/crop with y >= 32768)."""
    events = _stream(rng, 300, h=2**16, w=2**16)
    events[:3, 0] = [32768, 40000, 65535]
    events[:3, 1] = [65535, 1, 40000]
    ref = pack_chunks(events, 64)
    got = jax.jit(chunks_from_wire)(*pack_wire(events, 64))
    np.testing.assert_array_equal(np.asarray(got.y), np.asarray(ref.y))
    np.testing.assert_array_equal(np.asarray(got.x), np.asarray(ref.x))
    assert int(np.asarray(got.y).min()) >= 0


def test_wire_compact_to_plain_exact(rng):
    """The host-side compact->plain re-encode is exact: unpacking the
    converted triple equals unpacking the original quadruple."""
    from async_ev_cnn_tpu.utils.wire import (
        chunks_from_wire_compact,
        pack_wire_compact,
        wire_compact_to_plain,
    )

    events = _stream(rng, 500)
    w4 = pack_wire_compact(events, 64)
    assert w4 is not None
    a = jax.jit(chunks_from_wire_compact)(*w4)
    b = jax.jit(chunks_from_wire)(*wire_compact_to_plain(w4))
    for f in ("y", "x", "ts", "valid"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)))


def test_wire_rejects_out_of_range(rng):
    import pytest

    events = np.array([[70000, 3, 10]], np.int64)
    with pytest.raises(ValueError, match="2\\*\\*16"):
        pack_wire(events, 8)


def test_wire_compact_roundtrip(rng):
    from async_ev_cnn_tpu.utils.wire import (
        chunks_from_wire_compact,
        pack_wire_compact,
    )

    for n in (0, 1, 255, 256, 1000):
        events = _stream(rng, n)  # 160x224: coords fit 8 bits, deltas small
        ref = pack_chunks(events, 256)
        wire = pack_wire_compact(events, 256)
        assert wire is not None
        yx, dts, base, counts = wire
        assert yx.nbytes + dts.nbytes <= max(n, 1) * 4 + 256 * 4
        got = jax.jit(chunks_from_wire_compact)(yx, dts, base, counts)
        valid = np.asarray(ref.valid)
        np.testing.assert_array_equal(np.asarray(got.valid), valid)
        for a, b in ((got.y, ref.y), (got.x, ref.x), (got.ts, ref.ts)):
            # padded slots carry a repeated ts (keeps the delta span tight)
            # and are masked invalid — compare the valid slots
            np.testing.assert_array_equal(
                np.asarray(a)[valid], np.asarray(b)[valid]
            )


def test_wire_compact_fallback(rng):
    """Streams that don't fit the compact format return None (callers fall
    back to the 8 B/event wire): coords >= 256 or chunk ts spans >= 2^16."""
    from async_ev_cnn_tpu.utils.wire import pack_wire_compact

    big_coords = _stream(rng, 100, h=300, w=224)
    assert pack_wire_compact(big_coords, 64) is None
    wide_span = _stream(rng, 100)
    wide_span[:, 2] = np.arange(100) * 3000  # 300k µs span per 64-chunk
    assert pack_wire_compact(wide_span, 64) is None


def test_wire_batched_unpack(rng):
    """Leading batch axes (stacked dispatches / streams) unpack unchanged."""
    events = _stream(rng, 512)
    yx, ts, counts = pack_wire(events, 256)
    got = chunks_from_wire(
        jnp.stack([yx, yx]), jnp.stack([ts, ts]), jnp.stack([counts, counts])
    )
    ref = pack_chunks(events, 256)
    for i in range(2):
        np.testing.assert_array_equal(np.asarray(got.y[i]), np.asarray(ref.y))
        np.testing.assert_array_equal(
            np.asarray(got.valid[i]), np.asarray(ref.valid)
        )


def test_wire_polarity_roundtrip_plain(rng):
    """keep_polarity on the 8 B wire: p rides bit 31; y/x/ts/valid and p
    all round-trip exactly, including y up to 2**15 - 1."""
    import jax

    from async_ev_cnn_tpu.utils.wire import chunks_from_wire, pack_wire

    n = 200
    y = rng.randint(0, 2**15, n).astype(np.int64)
    x = rng.randint(0, 2**16, n).astype(np.int64)
    ts = np.sort(rng.randint(0, 2**31 - 1, n)).astype(np.int64)
    p = rng.randint(0, 2, n).astype(np.int64)
    events = np.stack([y, x, ts, p], axis=-1)
    got = jax.jit(lambda *w: chunks_from_wire(*w, polarity=True))(
        *pack_wire(events, 64, keep_polarity=True))
    valid = np.asarray(got.valid).reshape(-1)[:n]
    assert valid.all()
    np.testing.assert_array_equal(np.asarray(got.y).reshape(-1)[:n], y)
    np.testing.assert_array_equal(np.asarray(got.x).reshape(-1)[:n], x)
    np.testing.assert_array_equal(np.asarray(got.ts).reshape(-1)[:n], ts)
    np.testing.assert_array_equal(np.asarray(got.p).reshape(-1)[:n], p)


def test_wire_polarity_roundtrip_compact(rng):
    """keep_polarity on the 4 B wire: the bit-packed polarity plane
    round-trips exactly, and wire_compact_to_plain moves it to bit 31."""
    import jax

    from async_ev_cnn_tpu.utils.wire import (
        chunks_from_wire,
        chunks_from_wire_compact,
        pack_wire_compact,
        wire_compact_to_plain,
    )

    for n, cap in ((200, 64), (37, 32), (0, 16)):
        y = rng.randint(0, 256, n).astype(np.int64)
        x = rng.randint(0, 256, n).astype(np.int64)
        ts = np.sort(rng.randint(0, 50000, n)).astype(np.int64)
        p = rng.randint(0, 2, n).astype(np.int64)
        events = np.stack([y, x, ts, p], axis=-1).reshape(n, 4)
        w = pack_wire_compact(events, cap, keep_polarity=True)
        assert len(w) == 5 and w[4].dtype == np.uint8
        got = jax.jit(chunks_from_wire_compact)(*w)
        # ... and via the plain unification path
        got2 = jax.jit(lambda *a: chunks_from_wire(*a, polarity=True))(
            *wire_compact_to_plain(w))
        for g in (got, got2):
            valid = np.asarray(g.valid).reshape(-1)
            assert valid.sum() == n
            for plane, ref in (("y", y), ("x", x), ("ts", ts), ("p", p)):
                vals = np.asarray(getattr(g, plane)).reshape(-1)[valid.astype(bool)]
                np.testing.assert_array_equal(vals, ref)


def test_wire_polarity_validation(rng):
    from async_ev_cnn_tpu.utils.wire import pack_wire, pack_wire_compact

    ev3 = np.stack([np.arange(4), np.arange(4), np.arange(4)], axis=-1)
    with pytest.raises(ValueError, match="polarity"):
        pack_wire(ev3, 8, keep_polarity=True)
    bad_p = np.stack([np.arange(4)] * 3 + [np.array([-1, 1, 0, 1])], axis=-1)
    with pytest.raises(ValueError, match="0/1"):
        pack_wire(bad_p, 8, keep_polarity=True)
    with pytest.raises(ValueError, match="0/1"):
        pack_wire_compact(bad_p % 256, 8, keep_polarity=True)
    # y >= 2**15 collides with the polarity bit
    big_y = np.stack([np.full(4, 2**15), np.arange(4), np.arange(4),
                      np.ones(4)], axis=-1)
    with pytest.raises(ValueError, match="bit 31"):
        pack_wire(big_y, 8, keep_polarity=True)
    # ... but is fine without keep_polarity
    pack_wire(big_y, 8)


def test_wire_rejects_invalid_timestamps(rng):
    """Both packers enforce the non-negative int32 µs ts contract — a
    silently wrapped ts would corrupt the event-scatter engine's 31-bit
    dt payload (advisor finding, round 4)."""
    from async_ev_cnn_tpu.utils.wire import pack_wire, pack_wire_compact

    neg = np.stack([np.arange(4)] * 2 + [np.array([-5, 1, 2, 3])], axis=-1)
    big = np.stack([np.arange(4)] * 2
                   + [np.array([0, 1, 2, 2**31], np.int64)], axis=-1)
    for packer in (pack_wire, pack_wire_compact):
        with pytest.raises(ValueError, match="negative timestamp"):
            packer(neg, 8)
        with pytest.raises(ValueError, match="int32"):
            packer(big, 8)


def test_wire_ultra_roundtrip(rng):
    """The 3 B/event ultra tier (u8 per-event ts deltas + in-jit cumsum
    reconstruction) round-trips exactly vs pack_chunks."""
    from async_ev_cnn_tpu.utils.wire import (
        chunks_from_wire_ultra,
        pack_wire_ultra,
    )

    for n in (0, 1, 255, 256, 1000):
        events = _stream(rng, n)  # 160x224: coords fit 8 bits, deltas 1-19
        ref = pack_chunks(events, 256)
        wire = pack_wire_ultra(events, 256)
        assert wire is not None
        yx, d8, base, counts = wire
        assert yx.dtype == np.uint16 and d8.dtype == np.uint8
        assert yx.nbytes + d8.nbytes <= max(n, 1) * 3 + 256 * 3
        got = jax.jit(chunks_from_wire_ultra)(yx, d8, base, counts)
        valid = np.asarray(ref.valid)
        np.testing.assert_array_equal(np.asarray(got.valid), valid)
        for a, b in ((got.y, ref.y), (got.x, ref.x), (got.ts, ref.ts)):
            np.testing.assert_array_equal(
                np.asarray(a)[valid], np.asarray(b)[valid]
            )


def test_wire_ultra_fallback(rng):
    """Streams that don't fit the ultra tier return None: coords >= 256,
    a within-chunk inter-event gap >= 256 µs, non-monotone within-chunk
    ts, or a chunk span past u16 (capacity > 257 only — keeps the exact
    ultra->compact conversion guaranteed)."""
    from async_ev_cnn_tpu.utils.wire import pack_wire_ultra

    assert pack_wire_ultra(_stream(rng, 100, h=300, w=224), 64) is None
    gap = _stream(rng, 100)
    gap[50, 2] += 300  # one 300 µs inter-event gap mid-chunk
    gap[51:, 2] += 300
    assert pack_wire_ultra(gap, 64) is None
    unsorted = _stream(rng, 100)
    unsorted[[10, 11], 2] = unsorted[[11, 10], 2]  # swap two mid-chunk ts
    assert pack_wire_ultra(unsorted, 64) is None
    # span gate: 300-event chunks of max-u8 deltas would cumsum past u16
    span = _stream(rng, 600)
    span[:, 2] = np.arange(600, dtype=np.int32) * 255
    assert pack_wire_ultra(span, 300) is None
    # ... but the same stream fits at capacity 256 (span 65 279 < 2**16)
    assert pack_wire_ultra(span, 256) is not None


def test_wire_tier_unification_exact(rng):
    """wire_to_tier upconverts exactly: unpacking the ultra tuple, its
    compact re-encode, and its plain re-encode all agree."""
    from async_ev_cnn_tpu.utils.wire import (
        WIRE_TIERS,
        chunks_from_wire,
        chunks_from_wire_compact,
        chunks_from_wire_ultra,
        pack_wire_ultra,
        wire_format,
        wire_to_tier,
    )

    events = _stream(rng, 500)
    w3 = pack_wire_ultra(events, 64)
    assert wire_format(w3) == "ultra"
    w4 = wire_to_tier(w3, "compact")
    w8 = wire_to_tier(w3, "plain")
    assert wire_format(w4) == "compact" and wire_format(w8) == "plain"
    # already-at-or-above targets pass through unchanged
    assert wire_to_tier(w4, "compact") is w4
    assert wire_to_tier(w8, "ultra") is w8
    a = jax.jit(chunks_from_wire_ultra)(*w3)
    b = jax.jit(chunks_from_wire_compact)(*w4)
    c = jax.jit(chunks_from_wire)(*w8)
    for other in (b, c):
        for f in ("y", "x", "ts", "valid"):
            np.testing.assert_array_equal(
                np.asarray(getattr(a, f)), np.asarray(getattr(other, f)))
    assert WIRE_TIERS["ultra"] < WIRE_TIERS["compact"] < WIRE_TIERS["plain"]


def test_wire_polarity_roundtrip_ultra(rng):
    """keep_polarity on the 3 B wire: the bit-packed polarity plane
    round-trips exactly, directly and through both upconversions."""
    from async_ev_cnn_tpu.utils.wire import (
        chunks_from_wire,
        chunks_from_wire_compact,
        chunks_from_wire_ultra,
        pack_wire_ultra,
        wire_to_tier,
    )

    for n, cap in ((200, 64), (37, 32), (0, 16)):
        y = rng.randint(0, 256, n).astype(np.int64)
        x = rng.randint(0, 256, n).astype(np.int64)
        ts = np.cumsum(rng.randint(0, 200, n)).astype(np.int64)
        p = rng.randint(0, 2, n).astype(np.int64)
        events = np.stack([y, x, ts, p], axis=-1).reshape(n, 4)
        w = pack_wire_ultra(events, cap, keep_polarity=True)
        assert len(w) == 5 and w[4].dtype == np.uint8
        got = jax.jit(chunks_from_wire_ultra)(*w)
        got2 = jax.jit(chunks_from_wire_compact)(*wire_to_tier(w, "compact"))
        got3 = jax.jit(lambda *a: chunks_from_wire(*a, polarity=True))(
            *wire_to_tier(w, "plain"))
        for g in (got, got2, got3):
            valid = np.asarray(g.valid).reshape(-1)
            assert valid.sum() == n
            for plane, ref in (("y", y), ("x", x), ("ts", ts), ("p", p)):
                vals = np.asarray(getattr(g, plane)).reshape(-1)[
                    valid.astype(bool)]
                np.testing.assert_array_equal(vals, ref)


def test_wire_ultra_rejects_invalid_timestamps(rng):
    """The ultra packer enforces the same non-negative int32 µs ts
    contract as the other tiers."""
    from async_ev_cnn_tpu.utils.wire import pack_wire_ultra

    neg = np.stack([np.arange(4)] * 2 + [np.array([-5, 1, 2, 3])], axis=-1)
    big = np.stack([np.arange(4)] * 2
                   + [np.array([0, 1, 2, 2**31], np.int64)], axis=-1)
    with pytest.raises(ValueError, match="negative timestamp"):
        pack_wire_ultra(neg, 8)
    with pytest.raises(ValueError, match="int32"):
        pack_wire_ultra(big, 8)


def test_wire_ultra4_roundtrip(rng):
    """The 2.5 B/event ultra4 tier (two 4-bit ts deltas per byte +
    in-jit nibble expansion) round-trips exactly vs pack_chunks, for
    even and odd capacities and with leading batch axes."""
    from async_ev_cnn_tpu.utils.wire import (
        chunks_from_wire_ultra4,
        pack_wire_ultra4,
        wire_format,
    )

    def busy(n):
        ev = _stream(rng, n)
        if n:
            ev[:, 2] = np.cumsum(rng.randint(1, 16, n)).astype(np.int32)
        return ev

    for n, cap in ((0, 256), (1, 256), (255, 256), (256, 256),
                   (1000, 256), (100, 33)):
        events = busy(n)
        ref = pack_chunks(events, cap)
        wire = pack_wire_ultra4(events, cap)
        assert wire is not None
        yx, d4, base, counts = wire
        assert yx.dtype == np.uint16 and d4.dtype == np.uint8
        assert d4.shape[-1] == -(-cap // 2)
        assert wire_format(wire) == "ultra4"
        # 2.5 B/event + per-chunk overhead
        assert yx.nbytes + d4.nbytes <= max(n, 1) * 2.5 + cap * 2.5 + 1
        got = jax.jit(chunks_from_wire_ultra4)(yx, d4, base, counts)
        valid = np.asarray(ref.valid)
        np.testing.assert_array_equal(np.asarray(got.valid), valid)
        for a, b in ((got.y, ref.y), (got.x, ref.x), (got.ts, ref.ts)):
            np.testing.assert_array_equal(
                np.asarray(a)[valid], np.asarray(b)[valid]
            )
    # leading batch axis (stacked streams) unpacks unchanged
    events = busy(512)
    w = pack_wire_ultra4(events, 256)
    ref = pack_chunks(events, 256)
    got = jax.jit(chunks_from_wire_ultra4)(
        *(jnp.stack([a, a]) for a in w))
    for i in range(2):
        np.testing.assert_array_equal(np.asarray(got.ts[i]),
                                      np.asarray(ref.ts))
        np.testing.assert_array_equal(np.asarray(got.valid[i]),
                                      np.asarray(ref.valid))


def test_wire_ultra4_fallback(rng):
    """Streams that don't fit the ultra4 tier return None: coords >=
    256, a within-chunk inter-event gap >= 16 µs, non-monotone
    within-chunk ts, or capacity < 2 (where the d4 plane's width would
    collide with the yx plane's and wire_format could not classify)."""
    from async_ev_cnn_tpu.utils.wire import pack_wire_ultra4

    def busy(n):
        ev = _stream(rng, n)
        ev[:, 2] = np.cumsum(rng.randint(1, 16, n)).astype(np.int32)
        return ev

    assert pack_wire_ultra4(_stream(rng, 100, h=300, w=224), 64) is None
    gap = busy(100)
    gap[50:, 2] += 16  # one 16 µs-plus inter-event gap mid-chunk
    assert pack_wire_ultra4(gap, 64) is None
    assert pack_wire_ultra4(gap, 64 - 14) is not None  # gap on a boundary
    unsorted = busy(100)
    unsorted[[10, 11], 2] = unsorted[[11, 10], 2]
    assert pack_wire_ultra4(unsorted, 64) is None
    assert pack_wire_ultra4(busy(10), 1) is None
    # ts contract enforced like every other tier
    neg = np.stack([np.arange(4)] * 2 + [np.array([-5, 1, 2, 3])], axis=-1)
    big = np.stack([np.arange(4)] * 2
                   + [np.array([0, 1, 2, 2**31], np.int64)], axis=-1)
    with pytest.raises(ValueError, match="negative timestamp"):
        pack_wire_ultra4(neg, 8)
    with pytest.raises(ValueError, match="int32"):
        pack_wire_ultra4(big, 8)


def test_wire_ultra4_tier_ladder(rng):
    """wire_to_tier walks ultra4 up the whole ladder exactly, and the
    polarity plane rides every conversion."""
    from async_ev_cnn_tpu.utils.wire import (
        WIRE_TIERS,
        chunks_from_wire,
        chunks_from_wire_compact,
        chunks_from_wire_ultra,
        chunks_from_wire_ultra4,
        pack_wire_ultra4,
        wire_format,
        wire_to_tier,
    )

    assert (WIRE_TIERS["ultra4"] < WIRE_TIERS["ultra"]
            < WIRE_TIERS["compact"] < WIRE_TIERS["plain"])
    for n, cap in ((500, 64), (37, 33), (0, 16)):
        y = rng.randint(0, 256, n).astype(np.int64)
        x = rng.randint(0, 256, n).astype(np.int64)
        ts = np.cumsum(rng.randint(0, 16, n)).astype(np.int64)
        p = rng.randint(0, 2, n).astype(np.int64)
        events = np.stack([y, x, ts, p], axis=-1).reshape(n, 4)
        w25 = pack_wire_ultra4(events, cap, keep_polarity=True)
        assert w25 is not None and wire_format(w25) == "ultra4"
        w3 = wire_to_tier(w25, "ultra")
        w4 = wire_to_tier(w25, "compact")
        w8 = wire_to_tier(w25, "plain")
        assert wire_format(w3) == "ultra" and wire_format(w4) == "compact"
        assert wire_format(w8) == "plain"
        assert wire_to_tier(w25, "ultra4") is w25
        a = jax.jit(chunks_from_wire_ultra4)(*w25)
        b = jax.jit(chunks_from_wire_ultra)(*w3)
        c = jax.jit(chunks_from_wire_compact)(*w4)
        d = jax.jit(lambda *args: chunks_from_wire(*args, polarity=True))(
            *w8)
        for other in (b, c, d):
            for f in ("y", "x", "ts", "p", "valid"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(a, f)), np.asarray(getattr(other, f)))
        if n:
            valid = np.asarray(a.valid).reshape(-1)
            assert valid.sum() == n
            np.testing.assert_array_equal(
                np.asarray(a.p).reshape(-1)[valid.astype(bool)], p)


def test_wire_tier_differential_fuzz(rng):
    """Randomized differential: for random streams and capacities, every
    tier that accepts the stream must unpack to exactly pack_chunks'
    planes, and the auto ladder (ultra4 -> ultra -> compact -> plain)
    must accept every stream at some tier."""
    from async_ev_cnn_tpu.utils.wire import (
        chunks_from_wire,
        chunks_from_wire_compact,
        chunks_from_wire_ultra,
        chunks_from_wire_ultra4,
        pack_wire,
        pack_wire_compact,
        pack_wire_ultra,
        pack_wire_ultra4,
    )

    unpack_plain = jax.jit(chunks_from_wire)
    unpack_compact = jax.jit(chunks_from_wire_compact)
    unpack_ultra = jax.jit(chunks_from_wire_ultra)
    unpack_ultra4 = jax.jit(chunks_from_wire_ultra4)
    for trial in range(25):
        n = int(rng.randint(0, 400))
        cap = int(rng.choice([8, 32, 64, 256]))
        h = int(rng.choice([64, 256, 1024]))
        # delta scale sweeps across the tier gates (u4 / u8 / u16 / beyond)
        scale = int(rng.choice([3, 200, 5000, 200000]))
        y = rng.randint(0, h, n).astype(np.int64)
        x = rng.randint(0, h, n).astype(np.int64)
        ts = np.cumsum(rng.randint(0, scale, n)).astype(np.int64)
        if rng.rand() < 0.3 and n > 2:
            rng.shuffle(ts)  # non-monotone: ultra must refuse
        events = np.stack([y, x, ts], axis=-1)
        if ts.size and ts.max() >= 2**31:
            continue  # outside the int32 contract every tier enforces
        ref = pack_chunks(events, cap)
        valid = np.asarray(ref.valid)
        accepted = 0
        for packer, unpacker in ((pack_wire_ultra4, unpack_ultra4),
                                 (pack_wire_ultra, unpack_ultra),
                                 (pack_wire_compact, unpack_compact),
                                 (pack_wire, unpack_plain)):
            try:
                w = packer(events, cap)
            except ValueError:
                w = None  # pack_wire rejects coords >= 2**16 loudly
            if w is None:
                continue
            accepted += 1
            got = unpacker(*w)
            np.testing.assert_array_equal(np.asarray(got.valid), valid)
            for f in ("y", "x", "ts"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(got, f))[valid],
                    np.asarray(getattr(ref, f))[valid],
                    err_msg=f"tier {packer.__name__} plane {f} "
                            f"(trial {trial}, n={n}, cap={cap})")
        assert accepted >= 1 or h >= 2**16
