"""Compact host->device wire format for event upload.

The padded :class:`EventChunk` pytree costs 17 bytes/event on the wire
(four int32 planes + a bool mask).  For a sustained file->device serving
pipeline the host->device link is the scarce resource (the tunneled dev
chip moves ~30 MB/s; even PCIe is worth saving), and most of those bytes
are redundant: count-based packing makes every chunk full except the
last, so validity is one count per chunk, and y/x fit 16 bits each.

Wire format (8 bytes/event + 4 bytes/chunk):

* ``yx``     int32 ``[T, E]`` — ``(y << 16) | x``
* ``ts``     int32 ``[T, E]`` — timestamps (µs, the int32 contract)
* ``counts`` int32 ``[T]``    — valid events per chunk

Four tiers ship, each exact, each applying when the stream's statistics
allow and falling back to the next (``StreamingPipeline(wire='auto')``):

* **ultra4** (2.5 B/event): u16 ``(y << 8) | x`` + two 4-bit per-event
  ts deltas per byte — applies when coords < 256 and every within-chunk
  inter-event gap < 16 µs (very busy streams, > ~62.5k ev/s sustained
  within a chunk span — exactly the regime where the host->device link
  binds and bytes/event set the throughput ceiling);
* **ultra** (3 B/event): u16 ``(y << 8) | x`` + u8 per-event ts deltas,
  reconstructed by one in-jit int32 cumsum — applies when coords < 256
  and every within-chunk inter-event gap < 256 µs (busy streams, the
  serving regime: count-packed chunks at >= ~4k ev/s/chunk-span);
* **compact** (4 B/event): u16 yx + u16 ts deltas against a per-chunk
  base — gaps up to 65.5 ms;
* **plain** (8 B/event): the int32 pair above — any coords; ts must be
  non-negative int32 µs (every tier validates the ingestion contract —
  a negative or wrapped ts would silently corrupt the event-scatter
  engine's dt payload downstream, so the packers fail loudly instead).

``pack_wire`` builds it on the host (vectorized numpy, no per-event
loop); ``chunks_from_wire`` unpacks INSIDE jit on the device (three
cheap vector ops), so the expanded planes never cross the link.  The
round trip is exact vs ``pack_chunks`` (tests/test_wire.py).

Reference analog: the reference feeds raw ``[N, 3]`` numpy into each
``feed_network`` call (/root/reference/src/libs/runner.py:74-88); its
in-process numpy has no transfer cost to optimize.

By default neither format carries polarity (``p`` is zeroed on unpack):
the eFCN merges polarities, like the reference's network path
(/root/reference/src/libs/runner.py:32).  ``keep_polarity=True`` extends
both formats for 2-channel (ON/OFF) surface models: the 8 B format
steals the packed word's bit 31 (tightening the coordinate bound to
``y < 2**15``), and the 4 B format appends a packed 1-bit-per-event
plane (capacity/8 bytes per chunk, +3% wire).  Both round-trip exactly
(tests/test_wire.py).
"""

from __future__ import annotations

import numpy as np

from async_ev_cnn_tpu.layers.types import validate_int32_ts


def _polarity_col(events: np.ndarray) -> np.ndarray:
    """The p column as strict {0, 1} int32 — anything else (e.g. the
    {-1, 1} convention some tools use) must be normalized upstream, or
    the channel routing would silently misplace events."""
    if events.shape[1] < 4:
        raise ValueError(
            "keep_polarity needs a 4th (polarity) event column"
        )
    p = np.asarray(events[:, 3], np.int32)
    if p.size and (p.min() < 0 or p.max() > 1):
        raise ValueError(
            f"polarity must be 0/1 for the wire (got [{p.min()}, "
            f"{p.max()}]); map {{-1, 1}} conventions to {{0, 1}} first"
        )
    return p


def pack_wire(events: np.ndarray, capacity: int, keep_polarity: bool = False):
    """Pack a host ``[N, >=3]`` (y, x, ts[, p]) stream for upload.

    Returns numpy ``(yx [T, capacity] int32, ts [T, capacity] int32,
    counts [T] int32)``.  Requires ``0 <= y, x < 2**16`` and timestamps
    inside the non-negative int32 µs contract (validated here — a
    wrapped ts would silently corrupt the event-scatter engine's 31-bit
    dt payload downstream).  With ``keep_polarity`` the polarity rides
    bit 31 of the packed word (``y < 2**15`` then) — unpack with
    ``chunks_from_wire(..., polarity=True)``.
    """
    n = events.shape[0]
    t = max(1, -(-n // capacity))
    pad = t * capacity - n
    y = np.asarray(events[:, 0], np.int32)
    x = np.asarray(events[:, 1], np.int32)
    ts = validate_int32_ts(events[:, 2])
    y_cap = 2**15 if keep_polarity else 2**16
    if n and (y.min() < 0 or x.min() < 0 or y.max() >= y_cap or x.max() >= 2**16):
        raise ValueError(
            f"pack_wire needs 0 <= y < {y_cap} (bit 31 carries polarity "
            "under keep_polarity) and 0 <= x < 2**16"
        )
    # pack via int64 then truncate: for y >= 2**15 (or a polarity bit)
    # the packed word has the int32 sign bit set (the unpack masks it
    # back out), and a bare int32 shift would trip numpy overflow warnings
    packed64 = (y.astype(np.int64) << 16) | x.astype(np.int64)
    if keep_polarity:
        packed64 |= _polarity_col(events).astype(np.int64) << 31
    packed = packed64.astype(np.uint32).view(np.int32)
    yx = np.concatenate([packed, np.zeros(pad, np.int32)])
    tsp = np.concatenate([ts, np.zeros(pad, np.int32)])
    counts = np.full(t, capacity, np.int32)
    counts[-1] = capacity - pad if n else 0
    return yx.reshape(t, capacity), tsp.reshape(t, capacity), counts


def _pack_subplain(events, capacity, keep_polarity, ts_encoder,
                   empty_ts_plane):
    """Shared scaffolding of the three sub-plain packers (compact /
    ultra / ultra4): empty-stream tuple, the <256 coordinate gate, the
    padded ``[T, E]`` ts matrix, counts, and the optional bit-packed
    polarity plane.  Only the ts-delta encoding differs per tier —
    ``ts_encoder(tsp) -> (ts_plane, base) | None`` (None: stream does
    not fit the tier; the int64 wrap guards live in the encoders) and
    ``empty_ts_plane`` the tier's ``[1, w]`` zero plane for ``n == 0``.
    A change to the shared parts lands in every tier at once."""
    n = events.shape[0]
    t = max(1, -(-n // capacity))
    pad = t * capacity - n
    y = np.asarray(events[:, 0], np.int32)
    x = np.asarray(events[:, 1], np.int32)
    ts = validate_int32_ts(events[:, 2])
    pol_bytes = -(-capacity // 8)
    if n == 0:
        empty = (np.zeros((1, capacity), np.uint16), empty_ts_plane,
                 np.zeros(1, np.int32), np.zeros(1, np.int32))
        return empty + ((np.zeros((1, pol_bytes), np.uint8),)
                        if keep_polarity else ())
    if y.min() < 0 or x.min() < 0 or y.max() >= 256 or x.max() >= 256:
        return None
    tsp = np.concatenate([ts, np.full(pad, ts[-1], np.int32)]).reshape(
        t, capacity)
    enc = ts_encoder(tsp)
    if enc is None:
        return None
    ts_plane, base = enc
    yxp = np.concatenate(
        [(y << 8) | x, np.zeros(pad, np.int32)]
    ).reshape(t, capacity)
    counts = np.full(t, capacity, np.int32)
    counts[-1] = capacity - pad
    out = (yxp.astype(np.uint16), ts_plane, base.astype(np.int32), counts)
    if keep_polarity:
        p = _polarity_col(events)
        bits = np.concatenate([p, np.zeros(pad, np.int32)]).reshape(
            t, capacity).astype(bool)
        out += (np.packbits(bits, axis=1, bitorder="little"),)
    return out


def pack_wire_compact(events: np.ndarray, capacity: int,
                      keep_polarity: bool = False):
    """4 bytes/event wire: uint16 ``(y << 8) | x`` + uint16 ts deltas
    against a per-chunk int32 base.

    Applicable when every coordinate fits 8 bits (frames < 256 on each
    axis — the eFCN's 160x224 does) and every chunk's timestamp span fits
    16 bits (spans < 65.5 ms; count-packed DVS chunks are typically a few
    ms).  Returns ``(yx u16 [T, E], dts u16 [T, E], base i32 [T],
    counts i32 [T])`` or ``None`` when the stream does not fit — callers
    fall back to :func:`pack_wire` (8 B/event).  Exact: the device
    reconstructs ``ts = base + dts`` in int32.  Timestamps are validated
    against the non-negative int32 µs contract (a wrapped ts would
    silently corrupt the event-scatter engine downstream).

    With ``keep_polarity`` a fifth array is appended: ``pol`` uint8
    ``[T, ceil(capacity/8)]``, the little-endian bit-packed polarity
    plane (1 bit/event) — unpack with :func:`chunks_from_wire_compact`'s
    five-argument form.
    """
    def encode(tsp):
        base = tsp.min(axis=1)
        # int64 diff: an int32 subtraction could wrap for adversarial
        # spans (> 2**31) and sneak past the gate below
        dts = tsp.astype(np.int64) - base[:, None]
        if dts.max() >= 2**16:
            return None
        return dts.astype(np.uint16), base

    return _pack_subplain(events, capacity, keep_polarity, encode,
                          np.zeros((1, capacity), np.uint16))


def pack_wire_ultra(events: np.ndarray, capacity: int,
                    keep_polarity: bool = False):
    """3 bytes/event wire: uint16 ``(y << 8) | x`` + uint8 per-event ts
    deltas against the previous event (the chunk's first event against a
    per-chunk int32 base, so its delta is 0).

    Applicable when every coordinate fits 8 bits, timestamps are
    non-decreasing within each chunk, every within-chunk inter-event gap
    is < 256 µs, and each chunk's total span fits 16 bits (so the tuple
    always converts exactly to the compact tier; automatic for
    ``capacity <= 257``).  Busy event streams — the regime where the
    host->device link binds — satisfy the gap bound by construction:
    count-packed chunks at high rates have µs-scale gaps.  Returns
    ``(yx u16 [T, E], d8 u8 [T, E], base i32 [T], counts i32 [T])`` or
    ``None`` when the stream does not fit — callers fall back to
    :func:`pack_wire_compact` (4 B/event).  Exact: the device
    reconstructs ``ts = base + cumsum(d8)`` in int32.

    With ``keep_polarity`` the same bit-packed polarity plane as the
    compact tier is appended (``pol`` uint8 ``[T, ceil(capacity/8)]``).
    """
    def encode(tsp):
        base = tsp[:, 0]
        # int64 diffs: adversarial int32-spanning gaps must not wrap
        # past the gates below (same guard as the compact packer)
        d = np.diff(tsp.astype(np.int64), axis=1, prepend=base[:, None])
        if d.min() < 0 or d.max() >= 256 or d.sum(axis=1).max() >= 2**16:
            return None
        return d.astype(np.uint8), base

    return _pack_subplain(events, capacity, keep_polarity, encode,
                          np.zeros((1, capacity), np.uint8))


def pack_wire_ultra4(events: np.ndarray, capacity: int,
                     keep_polarity: bool = False):
    """2.5 bytes/event wire: uint16 ``(y << 8) | x`` + two 4-bit
    per-event ts deltas per byte (little-endian nibbles) against the
    previous event (the chunk's first event against a per-chunk int32
    base, so its delta is 0).

    Applicable when every coordinate fits 8 bits, timestamps are
    non-decreasing within each chunk, and every within-chunk inter-event
    gap is < 16 µs — the very-busy-stream regime (>~62.5k ev/s sustained
    inside a chunk's span) that is exactly where the host->device link
    binds and bytes/event set the pipe's ceiling.  The span gate of the
    wider tiers holds automatically for ``capacity <= 4369`` (15 µs max
    gap x capacity < 2**16) but is still checked, so the tuple always
    converts exactly up the ladder.  Returns ``(yx u16 [T, E], d4 u8
    [T, ceil(E/2)], base i32 [T], counts i32 [T])`` or ``None`` when the
    stream does not fit — callers fall back to :func:`pack_wire_ultra`
    (3 B/event).  ``capacity < 2`` also returns ``None``: there the d4
    plane's width would equal the yx plane's and :func:`wire_format`
    could not tell the tier from ultra.  Exact: the device expands the
    nibbles and reconstructs ``ts = base + cumsum(d)`` in int32.

    With ``keep_polarity`` the same bit-packed polarity plane as the
    other sub-plain tiers is appended (``pol`` u8 ``[T, ceil(cap/8)]``).
    """
    if capacity < 2:
        return None

    def encode(tsp):
        base = tsp[:, 0]
        # int64 diffs: adversarial int32-spanning gaps must not wrap
        # past the gates below (same guard as the wider packers)
        d = np.diff(tsp.astype(np.int64), axis=1, prepend=base[:, None])
        if d.min() < 0 or d.max() >= 16 or d.sum(axis=1).max() >= 2**16:
            return None
        d8 = d.astype(np.uint8)
        if capacity % 2:
            d8 = np.concatenate(
                [d8, np.zeros((len(d8), 1), np.uint8)], axis=1)
        return d8[:, 0::2] | (d8[:, 1::2] << 4), base

    half = -(-capacity // 2)
    return _pack_subplain(events, capacity, keep_polarity, encode,
                          np.zeros((1, half), np.uint8))


def wire_format(w) -> str:
    """Classify a wire tuple by shape+dtype sniffing — 'plain' (3 arrays),
    'compact' (u16 second plane), 'ultra' (u8 second plane, full width)
    or 'ultra4' (u8 second plane at HALF the yx plane's width — two
    4-bit deltas per byte; the packer refuses capacity < 2, where the
    widths would coincide).  The tier ORDER matters to callers unifying
    mixed groups: each tier converts exactly to the next
    (``WIRE_TIERS`` ranks them)."""
    if len(w) == 3:
        return "plain"
    if w[1].dtype == np.uint16:
        return "compact"
    return "ultra4" if w[1].shape[-1] != w[0].shape[-1] else "ultra"


#: tier name -> rank; higher rank = more general (unification target)
WIRE_TIERS = {"ultra4": 0, "ultra": 1, "compact": 2, "plain": 3}


def wire_ultra_to_compact(w):
    """Re-encode an ultra wire tuple as the compact tier on the host —
    exact (``dts = cumsum(d8)`` fits u16 by the ultra packer's span
    gate; the polarity plane is shared verbatim)."""
    yx16, d8, base, counts = w[:4]
    dts = np.cumsum(d8.astype(np.int32), axis=1)
    return (yx16, dts.astype(np.uint16), base, counts) + tuple(w[4:])


def wire_ultra4_to_ultra(w):
    """Re-encode an ultra4 wire tuple as the ultra tier on the host —
    exact (little-endian nibble expansion back to one u8 delta per
    event; the polarity plane is shared verbatim)."""
    yx16, d4, base, counts = w[:4]
    cap = yx16.shape[-1]
    lo = d4 & 0xF
    hi = d4 >> 4
    d8 = np.stack([lo, hi], axis=-1).reshape(*d4.shape[:-1], -1)[..., :cap]
    return (yx16, np.ascontiguousarray(d8), base, counts) + tuple(w[4:])


def wire_to_tier(w, tier: str):
    """Upconvert a wire tuple to ``tier`` (exact, host-side; a tuple
    already at or above the target is returned unchanged)."""
    if WIRE_TIERS[wire_format(w)] >= WIRE_TIERS[tier]:
        return w
    if wire_format(w) == "ultra4":
        w = wire_ultra4_to_ultra(w)
    if WIRE_TIERS[wire_format(w)] >= WIRE_TIERS[tier]:
        return w
    if wire_format(w) == "ultra":
        w = wire_ultra_to_compact(w)
    if tier == "plain" and wire_format(w) == "compact":
        w = wire_compact_to_plain(w)
    return w


def wire_compact_to_plain(w):
    """Re-encode a compact wire tuple (quadruple, or quintuple with the
    polarity plane) as the plain 8 B triple on the host — exact
    (``ts = base + dts`` in int32, coordinates < 256 fit the 16-bit
    fields trivially; a polarity plane moves to the plain word's bit 31).
    Lets a consumer unify a pre-packed group whose members chose
    different formats without the raw events."""
    yx16, dts, base, counts = w[:4]
    y = (yx16.astype(np.int32) >> 8) & 0xFF
    x = yx16.astype(np.int32) & 0xFF
    yx = (y << 16) | x
    if len(w) == 5:
        bits = np.unpackbits(w[4], axis=1, bitorder="little",
                             count=yx16.shape[1]).astype(np.int64)
        yx = ((yx.astype(np.int64) | (bits << 31))
              .astype(np.uint32).view(np.int32))
    return (yx, base.astype(np.int32)[:, None] + dts.astype(np.int32),
            counts)


def _unpack_polarity_plane(pol, capacity: int):
    """Expand the little-endian bit-packed polarity plane ``[..., B]``
    (B = ceil(capacity/8) bytes) to int32 ``[..., capacity]`` — inside
    jit (one static repeat + shift/mask, no gather)."""
    import jax
    import jax.numpy as jnp

    pol = jnp.asarray(pol).astype(jnp.int32)
    bytes_rep = jnp.repeat(pol, 8, axis=-1)[..., :capacity]
    bit = jax.lax.broadcasted_iota(
        jnp.int32, bytes_rep.shape, bytes_rep.ndim - 1) & 7
    return (bytes_rep >> bit) & 1


def chunks_from_wire_ultra(yx, d8, base, counts, pol=None):
    """Expand the ultra wire tuple into an EventChunk — inside jit.
    ``ts = base + cumsum(d8)`` in int32 (exact: the packer bounds each
    chunk's span below 2**16, and the base rides the int32 contract).
    ``pol`` is the optional bit-packed polarity plane."""
    import jax
    import jax.numpy as jnp

    from async_ev_cnn_tpu.layers.types import EventChunk

    yx = jnp.asarray(yx).astype(jnp.int32)
    valid = jax.lax.broadcasted_iota(jnp.int32, yx.shape, yx.ndim - 1) < (
        jnp.asarray(counts, jnp.int32)[..., None]
    )
    dts = jnp.cumsum(jnp.asarray(d8).astype(jnp.int32), axis=-1)
    return EventChunk(
        y=yx >> 8,
        x=yx & 0xFF,
        ts=jnp.asarray(base, jnp.int32)[..., None] + dts,
        p=(jnp.zeros_like(yx) if pol is None
           else _unpack_polarity_plane(pol, yx.shape[-1])),
        valid=valid,
    )


def chunks_from_wire_ultra4(yx, d4, base, counts, pol=None):
    """Expand the ultra4 wire tuple into an EventChunk — inside jit.
    Each d4 byte carries two little-endian 4-bit deltas; the expansion
    is one static repeat + shift/mask (no gather, the polarity-plane
    pattern), then ``ts = base + cumsum(d)`` in int32 (exact: the packer
    bounds each chunk's span below 2**16, and the base rides the int32
    contract).  ``pol`` is the optional bit-packed polarity plane."""
    import jax
    import jax.numpy as jnp

    from async_ev_cnn_tpu.layers.types import EventChunk

    yx = jnp.asarray(yx).astype(jnp.int32)
    cap = yx.shape[-1]
    valid = jax.lax.broadcasted_iota(jnp.int32, yx.shape, yx.ndim - 1) < (
        jnp.asarray(counts, jnp.int32)[..., None]
    )
    b = jnp.repeat(jnp.asarray(d4).astype(jnp.int32), 2, axis=-1)[..., :cap]
    nib = jax.lax.broadcasted_iota(jnp.int32, b.shape, b.ndim - 1) & 1
    dts = jnp.cumsum((b >> (nib << 2)) & 0xF, axis=-1)
    return EventChunk(
        y=yx >> 8,
        x=yx & 0xFF,
        ts=jnp.asarray(base, jnp.int32)[..., None] + dts,
        p=(jnp.zeros_like(yx) if pol is None
           else _unpack_polarity_plane(pol, cap)),
        valid=valid,
    )


def chunks_from_wire_compact(yx, dts, base, counts, pol=None):
    """Expand the compact wire tuple into an EventChunk — inside jit.
    ``pol`` is the optional bit-packed polarity plane (5-array form)."""
    import jax
    import jax.numpy as jnp

    from async_ev_cnn_tpu.layers.types import EventChunk

    yx = jnp.asarray(yx).astype(jnp.int32)
    valid = jax.lax.broadcasted_iota(jnp.int32, yx.shape, yx.ndim - 1) < (
        jnp.asarray(counts, jnp.int32)[..., None]
    )
    return EventChunk(
        y=yx >> 8,
        x=yx & 0xFF,
        ts=jnp.asarray(base, jnp.int32)[..., None]
        + jnp.asarray(dts).astype(jnp.int32),
        p=(jnp.zeros_like(yx) if pol is None
           else _unpack_polarity_plane(pol, yx.shape[-1])),
        valid=valid,
    )


def chunks_from_wire(yx, ts, counts, polarity: bool = False):
    """Expand the wire triple into an :class:`EventChunk` — inside jit.

    ``polarity`` (static) must match the packer's ``keep_polarity``: the
    bit layouts differ (bit 31 is polarity vs y's top bit) and the wire
    itself cannot distinguish them.
    """
    import jax
    import jax.numpy as jnp

    from async_ev_cnn_tpu.layers.types import EventChunk

    yx = jnp.asarray(yx, jnp.int32)
    valid = jax.lax.broadcasted_iota(jnp.int32, yx.shape, yx.ndim - 1) < (
        jnp.asarray(counts, jnp.int32)[..., None]
    )
    return EventChunk(
        # logical, not arithmetic, high-half extract: for y >= 2**15 (or
        # a polarity bit) the int32 pack sets the sign bit and a bare >>
        # would sign-extend
        y=(yx >> 16) & (0x7FFF if polarity else 0xFFFF),
        x=yx & 0xFFFF,
        ts=jnp.asarray(ts, jnp.int32),
        p=(yx >> 31) & 1 if polarity else jnp.zeros_like(yx),
        valid=valid,
    )
