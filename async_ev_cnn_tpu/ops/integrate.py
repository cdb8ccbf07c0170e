"""Leaky-surface integration of event chunks.

Replicates the exact clamp/leak ordering of the reference
(/root/reference/src/layers/integration.py:53-91 and src/libs/viz.py:7-24):
two sequential clamps — leak-subtract then clamp at zero, event-add then
clamp at zero — not one fused clamp.

Duplicate-pixel semantics: the reference uses numpy fancy-index ``+=``
(integration.py:71), which does **not** accumulate duplicates — the last
occurrence of a pixel in the chunk wins.  Since timestamps are
non-decreasing, "last occurrence" == "max ts at that pixel", which we
reproduce deterministically with a scatter-max of ts per pixel.

Numerical consistency: every rounded product feeding the surface
accumulation goes through ``ops.numerics.snap`` (see that module's
docstring) so XLA's per-fusion FMA contraction cannot make duplicated
copies of the arithmetic disagree about signs.  With snapped deltas the
whole surface lives on a ``2**-20`` grid and its arithmetic is exact.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from async_ev_cnn_tpu.ops.numerics import snap

# canonical sentinel for "no event at this pixel"; the Pallas surface-scan
# kernel (ops/pallas_scan.py) uses the python-int form — keep them one value
TS_SENTINEL_VALUE = -(2**31) + 1
TS_SENTINEL = jnp.int32(TS_SENTINEL_VALUE)


def _event_ts_map(y, x, ts, valid, h: int, w: int) -> jnp.ndarray:
    """Per-pixel max timestamp of the chunk's events; sentinel elsewhere.

    Broadcast compare + max-reduce over the chunk axis rather than a
    scatter: a 256-element scatter serializes on TPU (~0.6 ms/chunk
    measured), while the [H*W, E] compare/select/reduce fuses into regular
    VPU work.  Nominally O(H*W*E) VPU ops, but measured CHEAP in context
    (~1.7 ms marginal for T=200 vmapped maps at 160x224/E=256 on v5e) —
    see :func:`_event_ts_map_mxu` below for the measured-and-rejected
    MXU reformulation.
    """
    pix = jnp.where(valid, y.astype(jnp.int32) * w + x.astype(jnp.int32), -1)
    grid = jax.lax.broadcasted_iota(jnp.int32, (h * w, pix.shape[0]), 0)
    hit = grid == pix[None, :]
    ts_b = jnp.where(valid, ts.astype(jnp.int32), TS_SENTINEL)
    ts_map = jnp.max(
        jnp.where(hit, ts_b[None, :], TS_SENTINEL), axis=1
    )
    return ts_map.reshape(h, w)


def _event_ts_map_mxu(y, x, ts, valid, h: int, w: int) -> jnp.ndarray:
    """MXU reformulation of :func:`_event_ts_map` — a measured NEGATIVE
    result on v5e, kept (bit-exact, fuzz-gated in tests/test_integrate.py)
    as the record of the experiment.

    Idea: after an O(E^2) in-chunk dedup exactly one event survives per
    pixel, so the scatter is the rank-E outer-product sum

        map[h, w] = sum_e onehot_y[h, e] * onehot_x[w, e] * val[e]

    i.e. one ``[H, E] x [E, 5W]`` matmul — O((H+W) * E) one-hot builds
    instead of the O(H*W*E) compare-reduce, with the contraction on the
    MXU.  Measured in context (prefix ablation inside
    ``integrate_parallel``, T=200, 160x224, E=256, v5e): the map itself is
    a wash (~1.7 ms marginal for either formulation — XLA fuses the
    compare-reduce well and the op is HBM-bound), but the dot_general's
    output **layout poisons the downstream (b, c) associative scan**:
    4.4 -> 23.2 ms for the scan stage, an ~4x end-to-end regression that
    an ``optimization_barrier`` after the map does not undo.  So the
    compare-reduce stays the default.

    Exactness: the timestamp is carried as four 8-bit two's-complement
    limbs plus a presence column, so every product and every accumulation
    term is an integer < 2^8 with at most one nonzero addend per output —
    exact even under bf16 matmul precision (HIGHEST is pinned anyway).
    """
    e = y.shape[0]
    yi = y.astype(jnp.int32)
    xi = x.astype(jnp.int32)
    ts_b = jnp.where(valid, ts.astype(jnp.int32), TS_SENTINEL)
    pix = jnp.where(valid, yi * w + xi, -1)
    idx = jax.lax.iota(jnp.int32, e)
    # keep[e]: e is the (ts, index)-lexicographic max among its pixel's
    # valid events — the same winner _event_ts_map's max picks.
    same = pix[:, None] == pix[None, :]
    later = (ts_b[None, :] > ts_b[:, None]) | (
        (ts_b[None, :] == ts_b[:, None]) & (idx[None, :] > idx[:, None])
    )
    keep = valid & ~jnp.any(same & later, axis=1)

    oy = (jax.lax.broadcasted_iota(jnp.int32, (h, e), 0) == yi[None, :]).astype(
        jnp.float32
    )
    ox = (jax.lax.broadcasted_iota(jnp.int32, (w, e), 0) == xi[None, :]).astype(
        jnp.float32
    )
    # presence + four 8-bit two's-complement limbs of ts
    limbs = [(ts_b >> (8 * k)) & 0xFF for k in range(4)]
    vals = jnp.stack(
        [keep.astype(jnp.float32)]
        + [jnp.where(keep, l, 0).astype(jnp.float32) for l in limbs],
        axis=0,
    )  # [5, E]
    rhs = (vals[:, None, :] * ox[None, :, :]).reshape(5 * w, e)
    m = jax.lax.dot_general(
        oy, rhs, (((1,), (1,)), ((), ())), precision=jax.lax.Precision.HIGHEST
    ).reshape(h, 5, w)
    present = m[:, 0] > 0.5
    li = [m[:, 1 + k].astype(jnp.int32) for k in range(4)]
    rec = li[0] | (li[1] << 8) | (li[2] << 16) | (li[3] << 24)
    return jnp.where(present, rec, TS_SENTINEL)


def integrate_step(surface, prev_ts, y, x, ts, valid, leak: float, p=None):
    """One chunk of leaky integration.

    Args:
      surface: f32 ``[H, W]`` (single-channel) or ``[2, H, W]``
        (polarity-channel) current surface.
      prev_ts: int32 scalar, timestamp of the previous chunk's last event.
      y, x, ts, valid: padded chunk arrays ``[E]``.
      leak: leak rate per microsecond.
      p: int32 ``[E]`` polarities — required for a ``[2, H, W]`` surface;
        OFF events (p == 0) land in channel 0, ON in channel 1.  The
        reference drops polarity before the network (runner.py:32); the
        2-channel surface is a capability extension.

    Returns:
      ``(new_surface, last_ts, out_mask, delta_leak)`` where ``out_mask`` is
      the bool ``[H, W]`` event mask this layer emits (pixels that flipped
      positive -> non-positive in any channel, plus the input pixels,
      integration.py:76-83) and ``delta_leak`` the f32 scalar leak applied.
    """
    channeled = surface.ndim == 3
    if channeled and p is None:
        # without this, `valid & (p == ch)` silently evaluates to
        # all-False (None == ch) and every event is dropped — plausible
        # wrong output instead of an error
        raise TypeError(
            "a [C, H, W] channeled surface requires the polarity array p"
        )
    h, w = surface.shape[-2:]
    leak = jnp.float32(leak)
    # An all-padding chunk (e.g. an empty µs time bin) is a no-op step:
    # last_ts falls back to prev_ts so delta_leak is 0 and no event lands.
    last_ts = jnp.maximum(
        prev_ts, jnp.max(jnp.where(valid, ts, TS_SENTINEL))
    ).astype(jnp.int32)
    delta_leak = snap((last_ts - prev_ts).astype(jnp.float32) * leak)

    before_pos = surface > 0
    s1 = surface - delta_leak
    after_leak_neg = s1 <= 0
    s1 = jnp.where(after_leak_neg, jnp.float32(0), s1)

    if channeled:
        ts_map = jnp.stack([
            _event_ts_map(y, x, ts, valid & (p == ch), h, w)
            for ch in range(surface.shape[0])
        ])
    else:
        ts_map = _event_ts_map(y, x, ts, valid, h, w)
    ev_mask = ts_map > TS_SENTINEL
    contrib = jnp.float32(1) - snap((last_ts - ts_map).astype(jnp.float32) * leak)
    s2 = s1 + jnp.where(ev_mask, contrib, jnp.float32(0))
    after_ev_neg = s2 <= 0
    s2 = jnp.where(after_ev_neg, jnp.float32(0), s2)

    out_mask = (before_pos & (after_leak_neg | after_ev_neg)) | ev_mask
    if channeled:
        out_mask = jnp.any(out_mask, axis=0)
    return s2, last_ts, out_mask, delta_leak


def _ts_maps_windowed(chunks, valid_by_ch, h, w, wh, ww, oy, ox):
    """Per-chunk ts maps computed inside a ``[wh, ww]`` bounding window.

    DVS activity is spatially clustered (object edges), so each chunk's
    events usually fit a small box: the O(H*W*E) per-chunk compare-reduce
    shrinks to O(wh*ww*E) plus a sentinel-canvas placement.  Bit-exact by
    construction — same compare arithmetic in local coordinates, integer
    placement.  ``oy``/``ox`` are the per-chunk int32 ``[T]`` window
    origins (the caller already computed the bbox minima for its fit
    check).  Callers must ensure every chunk's events fit (see
    ``chunk_affine_updates``'s all-fit cond).
    """
    def one_channel(vv):
        def one_chunk(yy, xx, tt, v, oy_t, ox_t):
            local = _event_ts_map(yy - oy_t, xx - ox_t, tt, v, wh, ww)
            canvas = jnp.full((h, w), TS_SENTINEL, jnp.int32)
            return jax.lax.dynamic_update_slice(canvas, local, (oy_t, ox_t))

        return jax.vmap(one_chunk)(chunks.y, chunks.x, chunks.ts, vv, oy, ox)

    return jnp.stack([one_channel(vv) for vv in valid_by_ch], axis=1)


def integrate_parallel(surface, prev_ts, chunks, leak: float,
                       ts_window: tuple[int, int] | None = None,
                       engine: str = "auto"):
    """All ``T`` chunk-boundary surfaces at once (parallel-in-time).

    The sequential per-chunk pixel update (``integrate_step``) is
    ``f(s) = max(max(s - d, 0) + a, 0)`` with ``d`` the chunk's leak and
    ``a`` its event contribution — elementwise per pixel, so the
    parallelism that matters on TPU is across the H*W pixels, not across
    T.  Three engines compute the same surfaces:

    * ``'pallas'`` (default on TPU): the event-scatter kernel — the
      O(T*E) per-event winner lists (``chunk_event_updates``) are placed
      onto the surface *inside* the kernel by an exact one-hot MXU
      contraction, and the sequential recurrence runs with the carry in
      VMEM (:func:`~async_ev_cnn_tpu.ops.pallas_scan.surface_scan_events_pallas`).
      No [T, C, H, W] ts map is ever materialized in HBM and the
      O(H*W*E) per-chunk compare disappears.  Bit-identical to iterating
      ``integrate_step``.
    * ``'pallas_tsmap'``: the round-3 kernel — per-chunk int32 ts maps
      built by the XLA compare-reduce and streamed through the same
      VMEM-carried recurrence
      (:func:`~async_ev_cnn_tpu.ops.pallas_scan.surface_scan_pallas`).
      Kept as the A/B reference for the event-scatter engine.
    * ``'xla'`` (default off-TPU; also the cross-device building block
      in parallel/time_shard.py): expanding
      ``f(s) = max(s + (a - d), max(a, 0))`` shows f is a max-plus affine
      map ``g[b, c](s) = max(s + b, c)``, closed under composition::

          (g[b2, c2] . g[b1, c1])(s) = g[b1 + b2, max(c1 + b2, c2)](s)

      so the T updates collapse into one ``lax.associative_scan`` over
      ``(b, c)`` pairs.  Every ingredient goes through ``snap`` exactly
      like the sequential path, so the engines agree to the snap grid
      (the pallas engine exactly, the xla engine to ~1 ulp of regrouping;
      both gated in tests/test_equivalence.py + tests/test_pallas_scan.py).

    Args:
      surface: f32 ``[C, H, W]`` surface at the window start.
      prev_ts: int32 scalar, last event timestamp before the window.
      chunks: stacked :class:`EventChunk` with leading time axis ``[T, E]``.
      leak: leak rate per microsecond.
      ts_window: optional static ``(wh, ww)``.  When set, each chunk's
        per-pixel ts map is computed inside a ``[wh, ww]`` bounding box
        around that chunk's events (O(wh*ww*E) instead of O(H*W*E) —
        clustered DVS streams fit comfortably); one ``lax.cond`` falls
        back to the full compare for the whole dispatch if ANY chunk's
        bounding box exceeds the window, so results are bit-exact either
        way.  Note: under ``vmap`` (multi-stream serving) the cond becomes
        a select and BOTH formulations execute — use it on per-stream
        dispatch paths only.  The 'pallas' event-scatter engine ignores
        it (the O(H*W*E) compare it optimizes does not exist there).
      engine: ``'auto' | 'pallas' | 'pallas_tsmap' | 'xla'``.  ``'auto'``
        picks 'pallas' on the TPU backend, 'xla' elsewhere (the pallas
        kernels run in interpret mode off-TPU — exact but slow, for
        tests).

    Returns:
      ``(surfaces, last_ts)``: f32 ``[T, C, H, W]`` surfaces after each
      chunk and the int32 ``[T]`` per-chunk last-event timestamps.
    """
    channels, h, w = surface.shape
    # same scalar contract as integrate_step, which accepts a Python int
    # — without the coercion _ts_chain's prev_ts[None] raises TypeError
    prev_ts = jnp.asarray(prev_ts, jnp.int32)
    if engine == "auto":
        engine = "pallas" if jax.default_backend() == "tpu" else "xla"
    # interpret everywhere the Mosaic kernels can't compile.  Note the
    # limitation: this keys off the process-default backend at trace
    # time — jitting for a non-default backend on a mixed host should
    # pass engine='xla' explicitly.
    interpret = jax.default_backend() != "tpu"
    if engine == "pallas":
        from async_ev_cnn_tpu.ops.pallas_scan import surface_scan_events_pallas

        pix_r, pix_c, dt, d, last_ts = chunk_event_updates(
            channels, h, w, prev_ts, chunks, leak
        )
        surfaces = surface_scan_events_pallas(
            surface, pix_r, pix_c, dt, d, leak, interpret=interpret
        )
        return surfaces, last_ts
    if engine == "pallas_tsmap":
        from async_ev_cnn_tpu.ops.pallas_scan import surface_scan_pallas

        ts_map, dd, last_ts = chunk_ts_maps(
            channels, h, w, prev_ts, chunks, leak, ts_window=ts_window
        )
        surfaces = surface_scan_pallas(
            surface, ts_map, dd, last_ts, leak, interpret=interpret
        )
        return surfaces, last_ts
    if engine != "xla":
        raise ValueError(
            "engine must be 'auto', 'pallas', 'pallas_tsmap' or 'xla', "
            f"got {engine!r}"
        )
    b, c, last_ts = chunk_affine_updates(
        channels, h, w, prev_ts, chunks, leak, ts_window=ts_window
    )

    big_b, big_c = jax.lax.associative_scan(maxplus_combine, (b, c))
    surfaces = jnp.maximum(surface[None] + big_b, big_c)
    return surfaces, last_ts


def maxplus_combine(left, right):
    """Composition of max-plus affine maps ``g[b, c](s) = max(s + b, c)``:
    ``right`` applied after ``left``."""
    bl, cl = left
    br, cr = right
    return bl + br, jnp.maximum(cl + br, cr)


def _ts_chain(prev_ts, chunks, leak):
    """Per-chunk running last-event timestamps and snapped leak decrements
    — the scalar chain shared by every parallel-in-time front half.

    Returns ``(last_ts [T] int32, d [T] f32)``.  No-op (all-padding) chunks
    keep the previous last_ts, making them exact identity updates.
    """
    chunk_max = jnp.max(
        jnp.where(chunks.valid, chunks.ts, TS_SENTINEL), axis=1
    ).astype(jnp.int32)
    last_ts = jax.lax.associative_scan(
        jnp.maximum, jnp.maximum(chunk_max, prev_ts)
    )
    prev_last = jnp.concatenate([prev_ts[None], last_ts[:-1]])
    d = snap((last_ts - prev_last).astype(jnp.float32) * jnp.float32(leak))
    return last_ts, d


def chunk_event_updates(channels, h, w, prev_ts, chunks, leak):
    """O(E) per-event update lists for the event-scatter Pallas engine.

    The ts-map engines materialize int32 ``[T, C, H, W]`` maps in HBM
    (~29 MB/dispatch at T=200, 160x224) from an O(H*W*E) compare-reduce;
    but a chunk only carries E <= a few hundred events, so the surface
    update is fully described by O(T*E) numbers.  This computes them:

    * the in-chunk winner per pixel (the reference's last-duplicate-wins,
      integration.py:71 — = lexicographic (ts, index) max among same-pixel
      valid events, identical to the ts-map's per-pixel max-ts value);
    * each winner's flattened [C*H*W] pixel split into the kernel's
      (row = pix // LANES, lane = pix % LANES) coordinates — LANES is the
      kernel's fixed 128-lane geometry — losers/padding marked with
      row -1 (their one-hot placement row never matches);
    * ``dt = last_ts[t] - ts`` (int32, in [0, 2^31) given non-negative
      int32 timestamps — enforced at ingestion by
      ``EventChunk.from_arrays``; a negative ts would wrap dt past the
      kernel's 31-bit limb payload), from which the kernel reconstructs
      the event contribution with the exact :func:`integrate_step`
      arithmetic.

    Returns ``(pix_r, pix_c, dt, d, last_ts)`` with ``[T, E]`` int32 event
    arrays and the ``[T]`` scalar chains.
    """
    last_ts, d = _ts_chain(prev_ts, chunks, leak)

    yi = chunks.y.astype(jnp.int32)
    xi = chunks.x.astype(jnp.int32)
    if channels == 1:
        ch = jnp.zeros_like(yi)
        valid = chunks.valid
    else:
        ch = jnp.clip(chunks.p.astype(jnp.int32), 0, channels - 1)
        valid = chunks.valid & (chunks.p >= 0) & (chunks.p < channels)
    pix = jnp.where(valid, ch * (h * w) + yi * w + xi, -1)  # [T, E]

    # winner per pixel: no later (ts, idx)-lexicographic event at the same
    # pixel (same winner-value as _event_ts_map's max; O(T*E^2) compares on
    # E<=a few hundred — trivial next to the O(H*W*E) map it replaces)
    ts_b = jnp.where(valid, chunks.ts.astype(jnp.int32), TS_SENTINEL)
    idx = jax.lax.broadcasted_iota(jnp.int32, pix.shape, 1)
    same = (pix[:, :, None] == pix[:, None, :]) & valid[:, None, :]
    later = (ts_b[:, None, :] > ts_b[:, :, None]) | (
        (ts_b[:, None, :] == ts_b[:, :, None])
        & (idx[:, None, :] > idx[:, :, None])
    )
    keep = valid & ~jnp.any(same & later, axis=2)  # [T, E]

    from async_ev_cnn_tpu.ops.pallas_scan import LANES

    pix_r = jnp.where(keep, pix // LANES, -1)
    pix_c = jnp.where(keep, pix % LANES, 0)
    dt = jnp.where(keep, last_ts[:, None] - ts_b, 0)
    return pix_r, pix_c, dt, d, last_ts


def chunk_ts_maps(channels, h, w, prev_ts, chunks, leak, ts_window=None):
    """Per-chunk timestamp maps and leak decrements.

    Returns ``(ts_map, d, last_ts)``: int32 ``[T, C, H, W]`` per-pixel max
    event timestamps (sentinel where a chunk has no event at that pixel),
    f32 ``[T]`` snapped leak decrements, and the int32 ``[T]`` global
    running last-event timestamps.  The shared front half of the ts-map
    parallel-in-time engines (:func:`integrate_parallel`).
    """
    last_ts, d = _ts_chain(prev_ts, chunks, leak)

    if channels == 1:
        valid_by_ch = [chunks.valid]
    else:
        valid_by_ch = [chunks.valid & (chunks.p == ch) for ch in range(channels)]

    def _ts_maps_full(_):
        return jnp.stack([
            jax.vmap(
                lambda yy, xx, tt, vv: _event_ts_map(yy, xx, tt, vv, h, w)
            )(chunks.y, chunks.x, chunks.ts, vv)
            for vv in valid_by_ch
        ], axis=1)  # [T, C, H, W]

    if ts_window is None or (ts_window[0] >= h and ts_window[1] >= w):
        ts_map = _ts_maps_full(None)
    else:
        wh, ww = min(ts_window[0], h), min(ts_window[1], w)
        y_lo = jnp.where(chunks.valid, chunks.y, jnp.int32(2**30))
        y_hi = jnp.where(chunks.valid, chunks.y, jnp.int32(-1))
        x_lo = jnp.where(chunks.valid, chunks.x, jnp.int32(2**30))
        x_hi = jnp.where(chunks.valid, chunks.x, jnp.int32(-1))
        y_min = jnp.min(y_lo, axis=1)
        x_min = jnp.min(x_lo, axis=1)
        fits = (
            (jnp.max(y_hi, axis=1) - y_min < wh)
            & (jnp.max(x_hi, axis=1) - x_min < ww)
        )
        oy = jnp.clip(y_min, 0, h - wh)  # [T]
        ox = jnp.clip(x_min, 0, w - ww)
        ts_map = jax.lax.cond(
            jnp.all(fits),
            lambda _: _ts_maps_windowed(chunks, valid_by_ch, h, w, wh, ww, oy, ox),
            _ts_maps_full,
            None,
        )
    return ts_map, d, last_ts


def chunk_affine_updates(channels, h, w, prev_ts, chunks, leak,
                         ts_window=None):
    """Per-chunk max-plus coefficients of the leaky-surface update.

    Returns ``(b, c, last_ts)``: f32 ``[T, C, H, W]`` coefficient pairs
    such that chunk t's surface update is ``s -> max(s + b[t], c[t])``,
    and the int32 ``[T]`` global running last-event timestamps.  Used by
    :func:`integrate_parallel`'s 'xla' engine (one associative scan over
    the pairs) and the time-sharded engine
    (:mod:`async_ev_cnn_tpu.parallel.time_shard`: local scans + a
    cross-device prefix composition — the (b, c) algebra is what makes
    the cross-device composition possible).  All rounded products go
    through ``snap`` exactly like the sequential path.
    """
    ts_map, d, last_ts = chunk_ts_maps(
        channels, h, w, prev_ts, chunks, leak, ts_window=ts_window
    )
    leak = jnp.float32(leak)
    ev_mask = ts_map > TS_SENTINEL
    lt = last_ts[:, None, None, None]
    contrib = jnp.float32(1) - snap((lt - ts_map).astype(jnp.float32) * leak)
    a = jnp.where(ev_mask, contrib, jnp.float32(0))  # [T, C, H, W]

    b = a - d[:, None, None, None]
    c = jnp.maximum(a, jnp.float32(0))
    return b, c, last_ts


@partial(jax.jit, static_argnames=("leak", "h", "w"))
def _integrate_frame_jit(frame, prev_ts, y, x, ts, valid, leak, h, w):
    last_ts = jnp.maximum(
        prev_ts, jnp.max(jnp.where(valid, ts, TS_SENTINEL))
    ).astype(jnp.int32)
    leak = jnp.float32(leak)
    f1 = frame - snap((last_ts - prev_ts).astype(jnp.float32) * leak)
    f1 = jnp.where(f1 < 0, jnp.float32(0), f1)
    ts_map = _event_ts_map(y, x, ts, valid, h, w)
    ev_mask = ts_map > TS_SENTINEL
    contrib = jnp.float32(1) - snap((last_ts - ts_map).astype(jnp.float32) * leak)
    f2 = f1 + jnp.where(ev_mask, contrib, jnp.float32(0))
    f2 = jnp.where(f2 < 0, jnp.float32(0), f2)
    return f2, last_ts


def integrate_frame_chunked(events, leak, frame_h, frame_w,
                            prev_output=None, slice_len=2048):
    """:func:`integrate_frame` over fixed-size event slices.

    The plain accumulator jits with the event count baked into the
    shape: feeding whole variable-length recordings recompiles per
    distinct N (0.5-15 min each over the tunnel) and materializes an
    O(H*W*N) compare intermediate.  This carries ``(frame, last_ts)``
    across ``slice_len``-event slices instead — ONE compiled program per
    (slice_len, H, W) regardless of stream lengths, O(H*W*slice_len)
    memory.  Ragged slices pad by repeating their final event, which is
    exact within a slice (a duplicate (y, x, ts) never changes the
    slice's per-pixel max-ts winner).

    Semantics: identical to CHAINING :func:`integrate_frame` once per
    slice — the reference's per-micro-batch accumulation protocol
    (viz.py is called per batch and adds into the running frame), which
    the frame runners already use.  That is the same value as ONE
    whole-stream call only when no pixel receives events in two
    different slices; otherwise each slice's per-pixel winner adds
    (the accumulator is additive across calls by design).
    """
    events = np.asarray(events)
    n = events.shape[0]
    if n == 0:
        return integrate_frame(events, leak, frame_h, frame_w, prev_output)
    out = prev_output
    for i in range(0, n, slice_len):
        sl = events[i : i + slice_len]
        if sl.shape[0] < slice_len:
            pad = np.broadcast_to(
                sl[-1], (slice_len - sl.shape[0], *sl.shape[1:]))
            sl = np.concatenate([sl, pad])
        out = integrate_frame(sl, leak, frame_h, frame_w, out)
    return out


def integrate_frame(events, leak, frame_h, frame_w, prev_output=None):
    """Standalone stateless-in/out frame accumulator.

    API-parity port of the reference's visualisation-side accumulator
    (/root/reference/src/libs/viz.py:7-24): ``events`` is ``[N, 3]`` rows of
    ``(y, x, ts)``; returns ``(frame, last_ts)``.  Note viz.py clamps with
    ``< 0`` (strict) whereas the integration layer clamps ``<= 0`` — both
    zero out the same values, only the emitted-event bookkeeping differs,
    and this function emits no events.
    """
    events = jnp.asarray(events)
    if prev_output is None:
        frame = jnp.zeros((frame_h, frame_w), jnp.float32)
        prev_ts = jnp.int32(0)
    else:
        frame, prev_ts = prev_output
        frame = jnp.asarray(frame, jnp.float32)
        prev_ts = jnp.asarray(prev_ts, jnp.int32)
    if events.shape[0] == 0:
        # a quiet interval: nothing lands and no time advances (the
        # zero-size jnp.max inside the jit has no identity and would
        # raise); parity with the reference loop, which also leaves the
        # frame untouched for an empty slice
        return frame, prev_ts
    y, x, ts = events[:, 0], events[:, 1], events[:, 2]
    valid = jnp.ones(y.shape, bool)
    return _integrate_frame_jit(
        frame, prev_ts, y.astype(jnp.int32), x.astype(jnp.int32),
        ts.astype(jnp.int32), valid, float(leak), frame_h, frame_w
    )
