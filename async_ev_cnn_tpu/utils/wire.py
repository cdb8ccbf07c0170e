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

``pack_wire`` builds it on the host (vectorized numpy, no per-event
loop); ``chunks_from_wire`` unpacks INSIDE jit on the device (three
cheap vector ops), so the expanded planes never cross the link.  The
round trip is exact vs ``pack_chunks`` (tests/test_wire.py).

Reference analog: the reference feeds raw ``[N, 3]`` numpy into each
``feed_network`` call (/root/reference/src/libs/runner.py:74-88); its
in-process numpy has no transfer cost to optimize.

Neither format carries polarity (``p`` is zeroed on unpack): the eFCN
merges polarities, like the reference's network path.  A pipeline for a
polarity-surface model needs a wire extension (one sign bit — the
compact format has no spare bits; the 8 B format could steal y's top
bit) — not built until such a model needs serving.
"""

from __future__ import annotations

import numpy as np


def pack_wire(events: np.ndarray, capacity: int):
    """Pack a host ``[N, >=3]`` (y, x, ts, ...) stream for upload.

    Returns numpy ``(yx [T, capacity] int32, ts [T, capacity] int32,
    counts [T] int32)``.  Requires ``0 <= y, x < 2**16``.
    """
    n = events.shape[0]
    t = max(1, -(-n // capacity))
    pad = t * capacity - n
    y = np.asarray(events[:, 0], np.int32)
    x = np.asarray(events[:, 1], np.int32)
    ts = np.asarray(events[:, 2], np.int32)
    if n and (y.min() < 0 or x.min() < 0 or y.max() >= 2**16 or x.max() >= 2**16):
        raise ValueError("pack_wire needs 0 <= y, x < 2**16")
    # pack via int64 then truncate: for y >= 2**15 the packed word has
    # the int32 sign bit set (the unpack masks it back out), and a bare
    # int32 shift would trip numpy overflow warnings
    packed = ((y.astype(np.int64) << 16) | x.astype(np.int64)).astype(
        np.uint32).view(np.int32)
    yx = np.concatenate([packed, np.zeros(pad, np.int32)])
    tsp = np.concatenate([ts, np.zeros(pad, np.int32)])
    counts = np.full(t, capacity, np.int32)
    counts[-1] = capacity - pad if n else 0
    return yx.reshape(t, capacity), tsp.reshape(t, capacity), counts


def pack_wire_compact(events: np.ndarray, capacity: int):
    """4 bytes/event wire: uint16 ``(y << 8) | x`` + uint16 ts deltas
    against a per-chunk int32 base.

    Applicable when every coordinate fits 8 bits (frames < 256 on each
    axis — the eFCN's 160x224 does) and every chunk's timestamp span fits
    16 bits (spans < 65.5 ms; count-packed DVS chunks are typically a few
    ms).  Returns ``(yx u16 [T, E], dts u16 [T, E], base i32 [T],
    counts i32 [T])`` or ``None`` when the stream does not fit — callers
    fall back to :func:`pack_wire` (8 B/event).  Exact: the device
    reconstructs ``ts = base + dts`` in int32.
    """
    n = events.shape[0]
    t = max(1, -(-n // capacity))
    pad = t * capacity - n
    y = np.asarray(events[:, 0], np.int32)
    x = np.asarray(events[:, 1], np.int32)
    ts = np.asarray(events[:, 2], np.int32)
    if n == 0:
        return (np.zeros((1, capacity), np.uint16),
                np.zeros((1, capacity), np.uint16),
                np.zeros(1, np.int32), np.zeros(1, np.int32))
    if y.min() < 0 or x.min() < 0 or y.max() >= 256 or x.max() >= 256:
        return None
    tsp = np.concatenate([ts, np.full(pad, ts[-1], np.int32)]).reshape(
        t, capacity)
    base = tsp.min(axis=1)
    # int64 diff: an int32 subtraction could wrap for adversarial spans
    # (> 2**31) and sneak past the gate below
    dts = tsp.astype(np.int64) - base[:, None]
    if dts.max() >= 2**16:
        return None
    yxp = np.concatenate(
        [(y << 8) | x, np.zeros(pad, np.int32)]
    ).reshape(t, capacity)
    counts = np.full(t, capacity, np.int32)
    counts[-1] = capacity - pad
    return (yxp.astype(np.uint16), dts.astype(np.uint16),
            base.astype(np.int32), counts)


def wire_compact_to_plain(w):
    """Re-encode a compact wire quadruple as the plain 8 B triple on the
    host — exact (``ts = base + dts`` in int32, coordinates < 256 fit the
    16-bit fields trivially).  Lets a consumer unify a pre-packed group
    whose members chose different formats without the raw events."""
    yx16, dts, base, counts = w
    y = (yx16.astype(np.int32) >> 8) & 0xFF
    x = yx16.astype(np.int32) & 0xFF
    return ((y << 16) | x,
            base.astype(np.int32)[:, None] + dts.astype(np.int32),
            counts)


def chunks_from_wire_compact(yx, dts, base, counts):
    """Expand the compact wire quadruple into an EventChunk — inside jit."""
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
        p=jnp.zeros_like(yx),
        valid=valid,
    )


def chunks_from_wire(yx, ts, counts):
    """Expand the wire triple into an :class:`EventChunk` — inside jit."""
    import jax
    import jax.numpy as jnp

    from async_ev_cnn_tpu.layers.types import EventChunk

    yx = jnp.asarray(yx, jnp.int32)
    valid = jax.lax.broadcasted_iota(jnp.int32, yx.shape, yx.ndim - 1) < (
        jnp.asarray(counts, jnp.int32)[..., None]
    )
    return EventChunk(
        # logical, not arithmetic, high-half extract: for y >= 2**15 the
        # int32 pack sets the sign bit and a bare >> would sign-extend
        y=(yx >> 16) & 0xFFFF,
        x=yx & 0xFFFF,
        ts=jnp.asarray(ts, jnp.int32),
        p=jnp.zeros_like(yx),
        valid=valid,
    )
