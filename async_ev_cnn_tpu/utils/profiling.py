"""Profiling and timing instrumentation.

The reference's only observability is wall-clock prints
(/root/reference/src/libs/runner.py:83-96).  Here:

* :class:`StepTimer` — running per-step stats with events/sec, the runner's
  timing backend.
* :func:`trace` — context manager around ``jax.profiler`` so any run can
  capture a TensorBoard-viewable device trace (``--profile`` in the CLI).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


class StepTimer:
    """Accumulates per-step wall times and event counts."""

    def __init__(self):
        self.times: list[float] = []
        self.events: list[int] = []
        self._t0 = None

    def start(self):
        self._t0 = time.time()

    def stop(self, num_events: int = 0) -> float:
        dt = time.time() - self._t0
        self.times.append(dt)
        self.events.append(num_events)
        return dt

    @property
    def steps(self) -> int:
        return len(self.times)

    def summary(self, skip_warmup: int = 1) -> dict:
        t = np.asarray(self.times[skip_warmup:] or self.times)
        e = np.asarray(self.events[skip_warmup:] or self.events)
        return {
            "steps": self.steps,
            "mean_sec_per_step": float(t.mean()) if t.size else 0.0,
            "p50_sec_per_step": float(np.percentile(t, 50)) if t.size else 0.0,
            "p99_sec_per_step": float(np.percentile(t, 99)) if t.size else 0.0,
            "events_per_sec": float(e.sum() / t.sum()) if t.size and t.sum() else 0.0,
        }


def profile_layers(net, params, chunks, reps: int = 3, dispatches: int = 4):
    """Per-layer time attribution via prefix ablation.

    ``jax.profiler`` hangs over tunneled backends (ROADMAP.md), so this is
    the portable alternative: time a fused scan of the network truncated
    after layer k, for every k, and difference consecutive prefixes.  Each
    timing runs ``dispatches`` back-to-back device dispatches with a single
    host fetch at the end, so fixed dispatch/fetch round-trip latency
    (~30 ms on tunneled chips) amortizes instead of polluting every row.

    Returns a list of ``(layer_name, ms_per_chunk)`` rows (first row is the
    integration layer; each subsequent row is that layer's marginal cost),
    plus a ``('TOTAL', ...)`` row.
    """
    import time

    import jax
    import numpy as np

    state0 = net.init_state(params)
    t_chunks = int(chunks.y.shape[0])

    def timed(upto):
        import jax.numpy as jnp

        def scan_fn(state, cs, acc0):
            # the carried scalar sums the deepest computed layer's surface
            # mean, so no prefix layer can be dead-code-eliminated; threading
            # acc0 through chains the K dispatches so ONE final fetch waits
            # transitively on all of them
            def body(carry, chunk):
                st, acc = carry
                st, ios = net.forward(params, st, chunk, upto=upto)
                last = next(reversed(ios.values()))
                return (st, acc + jnp.mean(last.surface)), None

            (st, acc), _ = jax.lax.scan(body, (state, acc0), cs)
            return acc

        fn = jax.jit(scan_fn)
        float(fn(state0, chunks, jnp.float32(0)))  # compile + sync
        best = float("inf")
        for _ in range(reps):
            acc = jnp.float32(0)
            t0 = time.time()
            for _ in range(dispatches):
                acc = fn(state0, chunks, acc)
            float(acc)  # single host fetch = the only sync point
            best = min(best, time.time() - t0)
        return best / dispatches / t_chunks * 1e3  # ms per chunk

    rows = []
    prev = 0.0
    for i, ld in enumerate(net.event_layers):
        total = timed(i)
        rows.append((ld.name, total - prev))
        prev = total
    rows.append(("TOTAL", prev))
    return rows


def profile_layers_parallel(net, params, chunks, reps: int = 3,
                            dispatches: int = 8):
    """Stage attribution for the parallel-in-time path (`scan_parallel`).

    Same prefix-ablation scheme as :func:`profile_layers`, but each probe
    runs the REAL ``integrate_parallel`` + the T-batched network truncated
    after k layers, so the rows reflect the time-batched execution the
    headline uses (per-layer costs batch over T and differ a lot from the
    sequential rows).  Row 0 ('integrate') is the associative-scan surface
    reconstruction.  Every probe's operands depend on the chained carry —
    see docs/performance.md's "measurement discipline" for the hoisting /
    DCE traps this avoids.

    Returns ``[(name, ms_per_dispatch_marginal), ..., ('TOTAL', ms)]``.
    Each probe still contains one tunnel round trip, so on tunneled
    backends every TOTAL (and the first row's marginal) carries a
    ~RTT/dispatches additive bias (~3.6 ms at dispatches=8); marginals of
    later rows difference it away up to run-to-run noise.
    """
    import time

    import jax
    import jax.numpy as jnp

    from async_ev_cnn_tpu.ops.integrate import integrate_parallel

    if not net.is_all_full:
        raise ValueError("profile_layers_parallel requires an all-'full' net")
    state0 = net.init_state(params)
    ispec = net.event_layers[0].spec

    def timed(upto):
        def probe(surf0, pts0, acc0):
            def body(carry, k):
                surf, pts, acc = carry
                # roll every chunk leaf along the event axis by the loop
                # counter: a within-chunk permutation leaves every ts map
                # (a max over the chunk's events) BIT-IDENTICAL, but makes
                # the operands loop-variant so XLA cannot hoist the
                # event-only work (the ts-map compare) out of the chained
                # loop and under-attribute the integrate stage
                chunks_k = jax.tree.map(
                    lambda a: jnp.roll(a, k, axis=-1), chunks
                )
                surfaces, last_ts = integrate_parallel(
                    surf, pts, chunks_k, ispec.leak
                )
                if upto == 0:
                    out = jnp.mean(surfaces)
                else:
                    outs = jax.vmap(
                        lambda fr: net.full_frame_forward(
                            params, state0, fr, upto=upto
                        )
                    )(surfaces)
                    out = jnp.mean(outs)  # upto=None: full forward w/ tail
                # keep prev_ts loop-variant (tiny but data-dependent) so
                # no integrate stage is loop-invariant-hoistable
                new_pts = jax.lax.rem(last_ts[-1], jnp.int32(7))
                return (surfaces[-1], new_pts, acc + out), None
            (_, _, acc), _ = jax.lax.scan(
                body, (surf0, pts0, acc0), jnp.arange(dispatches)
            )
            return acc

        fn = jax.jit(probe)
        surf0 = state0[0].surface
        float(fn(surf0, jnp.int32(0), jnp.float32(0)))  # compile + sync
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            float(fn(surf0, jnp.int32(0), jnp.float32(0)))
            best = min(best, time.time() - t0)
        return best / dispatches * 1e3  # ms per dispatch

    rows = []
    prev = 0.0
    names = ["integrate"] + [ld.name for ld in net.event_layers[1:]]
    # conv+pool pairs the forward executes as ONE space-to-depth op
    # (network._s2d_pairs candidates, gated at trace time by
    # network._fusion_active) must be probed as one row: cutting between
    # them would time an unfused conv variant production never runs and
    # corrupt both marginals — so mirror full_frame_forward's gate
    # EXACTLY by calling the same trace-time predicate
    fused = net._s2d_pairs if net._fusion_active() else frozenset()
    probes = []
    k = 0
    while k < len(names):
        if (k - 1) in fused and k + 1 < len(names):
            probes.append((k + 1, f"{names[k]}+{names[k + 1]} (s2d)"))
            k += 2
        else:
            probes.append((k, names[k]))
            k += 1
    if net.dense_tail:
        probes.append((None, "tail"))  # upto=None = full forward incl. tail
    for upto, name in probes:
        total = timed(upto)
        rows.append((name, total - prev))
        prev = total
    rows.append(("TOTAL", prev))
    return rows


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Capture a jax.profiler trace under ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
