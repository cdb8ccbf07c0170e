"""Unit tests for leaky-surface integration semantics.

The expected values are computed by an independent numpy model written from
the reference's documented semantics (integration.py:53-91): leak-subtract
then clamp, event-add (last duplicate wins) then clamp, event mask =
(positive -> non-positive flips) | event pixels.
"""

import numpy as np
import jax.numpy as jnp

from async_ev_cnn_tpu.ops.integrate import (
    integrate_frame,
    integrate_parallel,
    integrate_step,
)
from async_ev_cnn_tpu.utils.equivalence import make_stream


def np_snap(x):
    """The 2**-20 rounding fence of ops/numerics.py (np.round is also
    half-to-even, matching jnp.round)."""
    return np.float32(np.round(np.float32(x) * np.float32(2.0**20)) * np.float32(2.0**-20))


def np_integrate(surface, prev_ts, y, x, ts, leak):
    surface = surface.copy()
    last_ts = int(ts.max())
    delta = np_snap(np.float32(last_ts - prev_ts) * np.float32(leak))
    before_pos = surface > 0
    surface -= delta
    after_leak_neg = surface <= 0
    surface[after_leak_neg] = 0.0
    # fancy-index += : last occurrence of a duplicate pixel wins
    vals = np.float32(1.0) - np_snap((last_ts - ts).astype(np.float32) * np.float32(leak))
    add = np.zeros_like(surface)
    for yi, xi, vi in zip(y, x, vals):
        add[yi, xi] = vi
    surface = surface + add
    after_ev_neg = surface <= 0
    surface[after_ev_neg] = 0.0
    mask = before_pos & (after_leak_neg | after_ev_neg)
    mask[y, x] = True
    return surface.astype(np.float32), last_ts, mask, np.float32(delta)


def run_step(surface, prev_ts, y, x, ts, leak):
    n = len(y)
    s, t, m, d = integrate_step(
        jnp.asarray(surface),
        jnp.int32(prev_ts),
        jnp.asarray(y, jnp.int32),
        jnp.asarray(x, jnp.int32),
        jnp.asarray(ts, jnp.int32),
        jnp.ones(n, bool),
        leak,
    )
    return np.asarray(s), int(t), np.asarray(m), float(d)


def test_matches_numpy_model(rng):
    h = w = 8
    leak = 0.1
    surface = np.zeros((h, w), np.float32)
    prev_ts = 0
    for step in range(50):
        n = rng.randint(1, 6)
        ts = np.sort(rng.randint(1, 10, size=n)).astype(np.int32) + prev_ts
        y = rng.randint(0, h, size=n).astype(np.int32)
        x = rng.randint(0, w, size=n).astype(np.int32)
        exp_s, exp_t, exp_m, exp_d = np_integrate(surface, prev_ts, y, x, ts, leak)
        got_s, got_t, got_m, got_d = run_step(surface, prev_ts, y, x, ts, leak)
        np.testing.assert_allclose(got_s, exp_s, atol=1e-6)
        assert got_t == exp_t
        np.testing.assert_array_equal(got_m, exp_m)
        assert abs(got_d - exp_d) < 1e-6
        surface, prev_ts = exp_s, exp_t


def test_duplicate_pixel_last_wins():
    # Two events on the same pixel with different ts: the later (larger ts,
    # smaller decay) contribution is kept, not the sum.
    surface = np.zeros((4, 4), np.float32)
    y = np.array([1, 1], np.int32)
    x = np.array([2, 2], np.int32)
    ts = np.array([5, 9], np.int32)
    got_s, _, _, _ = run_step(surface, 0, y, x, ts, 0.01)
    # last_ts = 9; contribution = 1 - (9-9)*0.01 = 1.0 (not 1.96)
    assert got_s[1, 2] == np.float32(1.0)


def test_leak_then_event_clamp_ordering():
    # A pixel at 0.05 with delta_leak 0.1 must clamp to 0 *before* the event
    # add; fusing into one clamp would give 0.05 - 0.1 + contrib instead.
    surface = np.zeros((2, 2), np.float32)
    surface[0, 0] = 0.05
    y = np.array([0], np.int32)
    x = np.array([0], np.int32)
    ts = np.array([10], np.int32)  # prev_ts 0, leak 0.01 -> delta 0.1
    got_s, _, mask, _ = run_step(surface, 0, y, x, ts, 0.01)
    assert np.isclose(got_s[0, 0], 1.0)  # 0 (clamped) + 1.0
    assert mask[0, 0]


def test_positive_to_negative_emits_event():
    surface = np.zeros((3, 3), np.float32)
    surface[2, 2] = 0.05  # will be wiped by the leak -> must emit an event
    y = np.array([0], np.int32)
    x = np.array([0], np.int32)
    ts = np.array([100], np.int32)
    _, _, mask, _ = run_step(surface, 0, y, x, ts, 0.01)
    assert mask[2, 2] and mask[0, 0]
    assert not mask[1, 1]


def test_empty_chunk_is_noop():
    # An all-padding chunk (empty µs bin) must leave state untouched —
    # not corrupt prev_ts with the sentinel.
    import jax.numpy as jnp
    surface = np.zeros((4, 4), np.float32)
    surface[1, 1] = 0.5
    s, t, m, d = integrate_step(
        jnp.asarray(surface), jnp.int32(7),
        jnp.zeros(3, jnp.int32), jnp.zeros(3, jnp.int32),
        jnp.zeros(3, jnp.int32), jnp.zeros(3, bool), 0.1,
    )
    assert d == 0.0 and int(t) == 7
    np.testing.assert_array_equal(np.asarray(s), surface)
    assert not np.asarray(m).any()


def test_integrate_parallel_fuzz_vs_sequential():
    """The associative max-plus composition must reproduce the sequential
    clamp chain for arbitrary streams, leaks, and duplicate/empty chunks."""
    import jax

    from async_ev_cnn_tpu.ops.integrate import integrate_parallel
    from async_ev_cnn_tpu.layers.types import EventChunk

    for seed, leak in [(0, 1e-4), (1, 0.05), (2, 0.7), (3, 5e-5)]:
        rng = np.random.RandomState(seed)
        t, e, h, w = 60, 6, 10, 12
        ts = np.sort(rng.randint(1, 30, (t, e)), axis=1)
        ts += np.cumsum(ts[:, -1])[:, None] - ts[:, -1:]
        chunks = EventChunk(
            y=jnp.asarray(rng.randint(0, h, (t, e)), jnp.int32),
            x=jnp.asarray(rng.randint(0, w, (t, e)), jnp.int32),
            ts=jnp.asarray(ts, jnp.int32),
            p=jnp.zeros((t, e), jnp.int32),
            valid=jnp.asarray(rng.rand(t, e) < 0.8),  # some all-invalid rows
        )
        surf0 = jnp.asarray(rng.rand(1, h, w).astype(np.float32))
        # sequential reference
        s, prev = surf0[0], jnp.int32(0)
        seq = []
        for i in range(t):
            s, prev, _, _ = integrate_step(
                s, prev, chunks.y[i], chunks.x[i], chunks.ts[i],
                chunks.valid[i], leak,
            )
            seq.append(np.asarray(s))
        surfs, last_ts = jax.jit(
            lambda s0, c: integrate_parallel(s0, jnp.int32(0), c, leak)
        )(surf0, chunks)
        np.testing.assert_allclose(
            np.asarray(surfs)[:, 0], np.stack(seq), atol=1e-5,
            err_msg=f"seed={seed} leak={leak}",
        )


def test_integrate_frame_standalone(rng):
    h, w, leak = 6, 7, 0.05
    state = None
    np_frame = np.zeros((h, w), np.float32)
    np_prev = 0
    for _ in range(20):
        n = rng.randint(1, 5)
        ts = np.sort(rng.randint(1, 8, size=n)) + np_prev
        y = rng.randint(0, h, size=n)
        x = rng.randint(0, w, size=n)
        events = np.stack([y, x, ts], axis=-1).astype(np.int32)
        frame, last = integrate_frame(events, leak, h, w, state)
        state = [frame, last]
        exp, np_prev, _, _ = np_integrate(np_frame, np_prev, y, x, ts.astype(np.int32), leak)
        np_frame = exp
        np.testing.assert_allclose(np.asarray(frame), exp, atol=1e-6)


def test_integrate_frame_empty_events():
    """A quiet interval must be a no-op, not a zero-size-reduction crash."""
    frame, last = integrate_frame(np.zeros((0, 3), np.int32), 0.05, 4, 5)
    np.testing.assert_array_equal(np.asarray(frame), np.zeros((4, 5)))
    assert int(last) == 0
    # and from a non-trivial carried state: frame unchanged, no leak
    state = [np.full((4, 5), 0.7, np.float32), np.int32(100)]
    frame, last = integrate_frame(np.zeros((0, 3), np.int32), 0.05, 4, 5,
                                  state)
    np.testing.assert_allclose(np.asarray(frame), state[0], atol=0)
    assert int(last) == 100


def test_integrate_frame_chunked_matches_plain(rng):
    """The fixed-slice accumulator: (a) the repeated-last-event padding
    is BIT-exact within one slice (a duplicate (y, x, ts) never changes
    a per-pixel max-ts winner); (b) across slices it chains (frame,
    last_ts) exactly like the runner's micro-batch protocol — equal to
    the whole-stream call up to per-slice rounding/clamp boundaries."""
    from async_ev_cnn_tpu.ops.integrate import integrate_frame_chunked

    h, w, leak = 9, 11, 0.01
    for n in (1, 17, 63):  # single padded slice: bit-exact
        ts = np.cumsum(rng.randint(1, 9, size=n))
        ev = np.stack([rng.randint(0, h, n), rng.randint(0, w, n),
                       ts], axis=-1).astype(np.int32)
        fa, la = integrate_frame(ev, leak, h, w)
        fb, lb = integrate_frame_chunked(ev, leak, h, w, slice_len=64)
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
        assert int(la) == int(lb)
    state = None
    for n in (0, 65, 200, 64):  # multi-slice: equals PER-SLICE chaining
        ts = np.cumsum(rng.randint(1, 9, size=max(n, 1)))[:n]
        ev = np.stack([rng.randint(0, h, n), rng.randint(0, w, n),
                       ts], axis=-1).astype(np.int32)
        ref = state
        for i in range(0, max(n, 1), 64):  # unpadded per-slice chain
            ref = integrate_frame(ev[i : i + 64], leak, h, w, ref)
        fb, lb = integrate_frame_chunked(ev, leak, h, w, state, slice_len=64)
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(fb))
        assert int(ref[1]) == int(lb)
        state = [fb, lb]


def test_channeled_integrate_step_requires_polarity(rng):
    """A [C, H, W] surface without p used to silently drop every event
    (None == ch is False) — it must raise instead."""
    import pytest

    surface = jnp.zeros((2, 4, 4), jnp.float32)
    with pytest.raises(TypeError, match="polarity"):
        integrate_step(surface, jnp.int32(0), jnp.array([1]),
                       jnp.array([1]), jnp.array([5]),
                       jnp.array([True]), 0.01)


def test_integrate_parallel_accepts_python_int_prev_ts(rng):
    """integrate_step takes prev_ts=0; integrate_parallel must too."""
    chunks = make_stream(rng, 3, 4, 6, 6)
    surfs, last = integrate_parallel(
        jnp.zeros((1, 6, 6), jnp.float32), 0, chunks, 0.01)
    surfs2, last2 = integrate_parallel(
        jnp.zeros((1, 6, 6), jnp.float32), jnp.int32(0), chunks, 0.01)
    np.testing.assert_array_equal(np.asarray(surfs), np.asarray(surfs2))
    np.testing.assert_array_equal(np.asarray(last), np.asarray(last2))


def test_ts_map_mxu_bitexact_vs_reference(rng):
    """The MXU outer-product formulation of the per-pixel ts map (a
    recorded negative-result experiment, see its docstring) must stay
    bit-exact vs the shipped compare-reduce formulation — callers branch
    on exact sentinel/int equality.  Covers duplicates, ties, negative and
    near-overflow timestamps, and all-invalid chunks."""
    import jax

    from async_ev_cnn_tpu.ops.integrate import _event_ts_map, _event_ts_map_mxu

    h, w, e = 11, 13, 32
    fast = jax.jit(lambda y, x, ts, v: _event_ts_map_mxu(y, x, ts, v, h, w))
    ref = jax.jit(lambda y, x, ts, v: _event_ts_map(y, x, ts, v, h, w))
    extremes = np.array([0, 1, -1, 5, 2**30, -(2**30), 2**31 - 2], np.int32)
    for trial in range(40):
        y = rng.randint(0, h, e).astype(np.int32)
        x = rng.randint(0, w, e).astype(np.int32)
        if trial % 3 == 0:
            ts = rng.choice(extremes, size=e).astype(np.int32)
        else:
            ts = np.sort(rng.randint(0, 6, e)).astype(np.int32)  # dup/tie-heavy
        valid = rng.rand(e) < (0.0 if trial % 13 == 0 else 0.8)
        a = np.asarray(fast(y, x, ts, valid))
        b = np.asarray(ref(y, x, ts, valid))
        np.testing.assert_array_equal(a, b, err_msg=f"trial={trial}")


def test_ts_window_bitexact_vs_full(rng):
    """integrate_parallel with a ts_window must be bit-exact vs the full
    compare: windowed path when every chunk's bbox fits, cond-fallback when
    any overflows.  Covers clustered fits, one-chunk overflow, empty
    chunks, and the polarity-channel surface."""
    import jax
    import jax.numpy as jnp

    from async_ev_cnn_tpu.layers.types import EventChunk
    from async_ev_cnn_tpu.ops.integrate import integrate_parallel

    h, w, t, e = 24, 30, 6, 12
    leak = 0.01

    def run(chunks, channels, win):
        surf = jnp.zeros((channels, h, w), jnp.float32)
        full = jax.jit(lambda c: integrate_parallel(surf, jnp.int32(0), c, leak))
        wind = jax.jit(
            lambda c: integrate_parallel(surf, jnp.int32(0), c, leak, ts_window=win)
        )
        sf, lf = full(chunks)
        sw, lw = wind(chunks)
        np.testing.assert_array_equal(np.asarray(lf), np.asarray(lw))
        np.testing.assert_array_equal(np.asarray(sf), np.asarray(sw))

    for trial in range(6):
        cy, cx = rng.randint(4, h - 4), rng.randint(4, w - 4)
        y = np.clip(cy + rng.randint(-3, 4, (t, e)), 0, h - 1).astype(np.int32)
        x = np.clip(cx + rng.randint(-3, 4, (t, e)), 0, w - 1).astype(np.int32)
        ts = np.sort(rng.randint(1, 50, t * e)).reshape(t, e).astype(np.int32)
        valid = rng.rand(t, e) < 0.8
        if trial == 2:
            valid[3] = False  # an empty chunk inside the window path
        if trial == 3:
            y[4, 0], x[4, 0], valid[4, 0] = 0, 0, True  # force overflow
            y[4, 1], x[4, 1], valid[4, 1] = h - 1, w - 1, True
        p = rng.randint(0, 2, (t, e)).astype(np.int32)
        chunks = EventChunk(
            y=jnp.asarray(y), x=jnp.asarray(x), ts=jnp.asarray(ts),
            p=jnp.asarray(p), valid=jnp.asarray(valid),
        )
        run(chunks, 1, (10, 10))
        run(chunks, 2, (10, 10))
        run(chunks, 1, (64, 64))  # window >= frame: full path short-circuit


def test_integrate_frame_chunked_cross_slice_divergence_is_by_design(rng):
    """A pixel that fires in TWO different slices contributes once per
    slice (the accumulator is additive across calls — the reference's
    per-micro-batch protocol, viz.py called once per batch), which is
    NOT the single whole-stream call's last-winner-only value.  This
    test pins the divergence so neither side gets 'fixed' silently
    (advisor finding, round 4; PARITY.md frame-path note)."""
    from async_ev_cnn_tpu.ops.integrate import (
        integrate_frame,
        integrate_frame_chunked,
    )

    h, w, leak = 4, 4, 0.01
    # two events on the SAME pixel, far enough apart to land in
    # different 2-event slices, with two spacer events between
    ev = np.array([
        [1, 1, 10],   # slice 0
        [0, 0, 20],   # slice 0
        [2, 2, 30],   # slice 1
        [1, 1, 40],   # slice 1 — same pixel as event 0
    ], np.int32)
    one_shot, _ = integrate_frame(ev, leak, h, w)
    chunked, _ = integrate_frame_chunked(ev, leak, h, w, slice_len=2)
    one_shot, chunked = np.asarray(one_shot), np.asarray(chunked)
    # the twice-hit pixel accumulates a contribution per slice
    assert chunked[1, 1] > one_shot[1, 1]
    # ... and equals the per-slice chain exactly
    ref = integrate_frame(ev[2:], leak, h, w,
                          integrate_frame(ev[:2], leak, h, w))
    np.testing.assert_array_equal(np.asarray(ref[0]), chunked)
    # pixels hit in one slice only agree between the protocols
    np.testing.assert_allclose(one_shot[0, 0], chunked[0, 0], atol=1e-6)
    np.testing.assert_allclose(one_shot[2, 2], chunked[2, 2], atol=1e-6)
