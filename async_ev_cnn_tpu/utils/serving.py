"""Production serving loop: event source -> wire -> chained dispatches.

The reference's serving shape is ``Runner.run`` — decode a file, call
``feed_network`` per micro-batch, all in one python loop
(/root/reference/src/libs/runner.py:49-103).  In-process numpy pays no
transfer or dispatch cost, so that loop is fine there.  On an
accelerator the same loop serializes on per-step dispatch latency and
ships events over the host->device link uncompressed; this module is
the TPU-native serving engine (and the engine behind ``bench.py``'s
sustained-pipeline benchmark):

* events cross the link in the compact 4 B/event wire
  (:mod:`async_ev_cnn_tpu.utils.wire`) with automatic 8 B fallback;
* each dispatch runs the parallel-in-time network over the packed
  chunks (:meth:`EventNetwork.scan_parallel`), optionally vmapped over
  ``streams`` independent per-stream states (multi-camera serving);
* dispatches CHAIN on-device — the network state feeds forward, so the
  host never waits for a step to finish before enqueueing the next;
* a bounded in-flight window applies backpressure: without it a fast
  producer piles up a device backlog whose input buffers pin HBM.  The
  window is released with ONE tail fetch per half-window — a single
  device executes programs in enqueue order, so fetching the newest
  popped dispatch's checksum proves every older dispatch retired.
  Backpressure therefore costs one host round trip per
  ``max_in_flight/2`` dispatches, not one per dispatch (which would
  serialize the loop on the round trip: measured 2.3-3.0M ev/s vs 4.8M
  on the tunneled dev chip).

Results are yielded IN ORDER as retirement is proven, as
:class:`DispatchResult` whose ``outputs`` are still on device — the
consumer decides what (if anything) to fetch, because device->host
bandwidth is the scarce resource on exactly the deployments that need
this loop.
"""

from __future__ import annotations

import time
from collections import deque
from typing import Any, Iterable, Iterator, NamedTuple

import numpy as np

# Endless-feed clock handling: int32 µs wraps at ~35.8 min, so the
# pipeline rebases each stream's time base once its relative clock
# passes this threshold (raw-event sources only; the state's prev_ts
# shifts with it on device, which is EXACT — the integrate arithmetic
# uses only timestamp differences).  2**30 µs = ~17.9 min leaves the
# full second half of the int32 range for the dispatch window itself.
_REBASE_AT = 2**30


class PreparedItem(NamedTuple):
    """One raw source item after producer-side :meth:`StreamingPipeline.
    prepare`: the packed wire tuple plus the two int32 ``prev_ts`` shift
    halves its rebase (if any) requires on device.  Unlike a bare wire
    tuple, a PreparedItem is valid on a rebased stream — the epoch
    bookkeeping already happened at prepare time."""

    wire: tuple
    deltas: np.ndarray  # int32 [2] prev_ts shift halves (zeros: no rebase)
    #: wall-clock of :meth:`~StreamingPipeline.prepare` — the item's
    #: events exist (packed, queued) from this moment, so event-age
    #: staleness counts producer-queue residency from here.  ``None``
    #: (hand-built items) falls back to the serve-loop pop time.
    t_created: float | None = None
    #: stream index this item was prepared for — :meth:`serve` validates
    #: it against the dispatch slot, so a shared multi-producer queue
    #: that delivers streams out of round-robin order raises loudly
    #: instead of silently cross-wiring stream states.  ``None``
    #: (hand-built items): not validated.
    stream: int | None = None
    #: the stream's cumulative rebase epoch (µs) AFTER this item's
    #: rebase.  :meth:`serve` derives the device ``prev_ts`` shift from
    #: the gap between this and the stream's last DISPATCHED epoch, so
    #: items dropped between prepare() and dispatch (a ragged
    #: multi-stream tail, a consumer that exits serve() while the
    #: producer queue still holds items) cannot desynchronize the device
    #: clock from the host epoch.  ``None`` (hand-built items): the
    #: item's ``deltas`` are applied verbatim, bypassing the ledger.
    epoch: int | None = None


class DispatchResult(NamedTuple):
    """One retired dispatch: ``outputs`` is the (device-resident)
    postprocessed network output, ``n_events`` the valid events it
    consumed, and ``counts`` the host-side int32 valid-event counts per
    chunk (``[T]``, or ``[S, T]`` for multi-stream) — zero-count chunks
    are exact no-op padding steps whose outputs repeat the previous
    surface (consumers writing per-chunk results should skip them)."""

    outputs: Any
    n_events: int
    counts: Any = None


class StreamingPipeline:
    """Chained-dispatch serving engine for an all-'full' EventNetwork.

    Parameters
    ----------
    net, params:
        The :class:`EventNetwork` (every conv/pool layer in 'full' mode
        — the :meth:`scan_parallel` requirement) and its weights.
    capacity:
        Events per packed chunk (the static chunk width).
    window:
        ``scan_parallel`` time window (memory bound), or ``None``.
    streams:
        Independent streams vmapped into each dispatch.  ``serve``
        consumes ``streams`` consecutive source items per dispatch, one
        per stream slot, and carries per-stream network state.
    max_in_flight:
        Backpressure window (dispatches).
    wire:
        'auto' (the smallest tier each item fits: 2.5 B/event ultra4 ->
        3 B ultra -> 4 B compact -> 8 B plain, see
        :mod:`async_ev_cnn_tpu.utils.wire`), or pin one of
        'ultra4'/'ultra'/'compact' (raise if an item does not fit) /
        'plain'.
    postprocess:
        Optional traced function applied to the network outputs inside
        the dispatch (e.g. a YOLO head decode or top-k) so only small
        results are ever fetched.  Default: identity.
    keep_polarity:
        Serve a 2-channel (ON/OFF) surface network: sources must supply
        a 4th polarity column (strict {0, 1}), the wire carries it (bit
        31 of the 8 B word, a 1-bit packed plane on the 4 B format), and
        the first conv's in_channels must be 2.  Default off — the eFCN
        drops polarity like the reference (runner.py:32).
    rebase:
        Endless-feed clock handling (default on): raw-array sources may
        carry int64 µs timestamps past the int32 range; each stream's
        time base is rebased once its relative clock passes ~17.9 min
        (2**30 µs), with the state's ``prev_ts`` shifted on device by
        the same delta — EXACT, the integrate arithmetic uses only
        timestamp differences.  Pre-packed wire items cannot be rebased
        (their base is unknowable); mixing them with a rebased stream
        raises.
    t_chunks:
        Default chunk count every serve-side ``pack`` pads to (static
        dispatch shape — one compiled program for variable-length raw
        items).  ``None`` leaves items their natural length.
    mesh:
        Optional ``jax.sharding.Mesh`` with axes ``(data, model)`` (see
        :func:`async_ev_cnn_tpu.parallel.streams.make_mesh`).  The
        stream axis shards over ``data`` (streams must divide evenly)
        and conv weights/state shard their channel axis over ``model``
        — the serving scale-out composition: each dispatch is ONE
        GSPMD program over the whole mesh, with the same chained
        in-order retirement semantics (XLA runs a multi-device
        program's dispatches in enqueue order just like a single
        device's, so the one-fetch watermark drain still proves
        retirement).  Requires ``streams > 1``.
    """

    def __init__(self, net, params, *, capacity=256, window=None,
                 streams=1, max_in_flight=16, wire="auto",
                 postprocess=None, mesh=None, keep_polarity=False,
                 rebase=True, t_chunks=None):
        import functools

        import jax
        import jax.numpy as jnp

        from async_ev_cnn_tpu.utils.wire import (
            chunks_from_wire,
            chunks_from_wire_compact,
            chunks_from_wire_ultra,
            chunks_from_wire_ultra4,
        )

        if streams < 1:
            raise ValueError("streams must be >= 1")
        if max_in_flight < 1:
            raise ValueError("max_in_flight must be >= 1")
        if wire not in ("auto", "ultra4", "ultra", "compact", "plain"):
            raise ValueError(
                "wire must be 'auto', 'ultra4', 'ultra', 'compact' or "
                "'plain'")
        if keep_polarity and net.event_layers[0].spec.channels != 2:
            raise ValueError(
                "keep_polarity serving needs a 2-channel (ON/OFF) surface "
                "network — the first conv's in_channels must be 2, got "
                f"{net.event_layers[0].spec.channels}"
            )
        if streams > 1 and getattr(net, "_stem_fusion", None) == "auto":
            # 'auto' means "the measured winner for this execution shape".
            # Its trace-time predicate was measured on the SINGLE-stream
            # parallel-in-time step (1.15x win at the demoted tier); under
            # the vmapped multi-stream shape the same fusion REGRESSES
            # 28-40% (2026-08-19 full-protocol capture: fused f32-act
            # serving sweep 6.53-8.30M vs the unfused captures'
            # 9.06-12.81M, with every unfused row of the same run
            # in-band; docs/performance.md "Stem fusion x vmapped
            # serving").  vmap traces with per-stream shapes, so the
            # network itself cannot see the batching — the engine, which
            # knows `streams`, overrides here.  An explicit
            # stem_fusion=True/False on the net is always respected.
            net = net.with_stem_fusion(False)
        self._net = net
        self._capacity = capacity
        self._streams = streams
        self._max_in_flight = max_in_flight
        self._wire = wire
        self._keep_polarity = keep_polarity
        self._rebase = rebase
        self._t_chunks = t_chunks
        #: per-stream int64 µs epoch subtracted from raw source
        #: timestamps (grows as the stream is rebased past int32)
        self._epochs = [0] * streams
        #: per-stream epoch actually APPLIED on device (prev_ts shifted
        #: at dispatch).  Trails ``_epochs`` when prepare()d items sit in
        #: a producer queue; serve() closes the gap per dispatched item,
        #: absorbing any items dropped in between.
        self._applied_epochs = [0] * streams
        chunks_from_wire = functools.partial(
            chunks_from_wire, polarity=keep_polarity)
        _UNPACKERS = {"plain": chunks_from_wire,
                      "compact": chunks_from_wire_compact,
                      "ultra": chunks_from_wire_ultra,
                      "ultra4": chunks_from_wire_ultra4}
        post = postprocess if postprocess is not None else (lambda outs: outs)

        jparams = {k: jnp.asarray(v) for k, v in params.items()}
        engine = None
        if mesh is not None:
            from async_ev_cnn_tpu.parallel.streams import MultiStreamEngine

            n_data = mesh.shape["data"]
            if streams < 2 or streams % n_data:
                raise ValueError(
                    f"mesh serving needs streams (= {streams}) divisible "
                    f"by the mesh's data axis (= {n_data})"
                )
            engine = MultiStreamEngine(net, mesh)
            jparams = engine.place_params(jparams)
            state = engine.init_states(jparams, streams)
        else:
            state = net.init_state(jparams)
            if streams > 1:
                state = jax.tree.map(
                    lambda a: jnp.broadcast_to(a, (streams, *a.shape)),
                    state,
                )
        self._state = state

        self._wire_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # [S, T, E] pipeline layout: P('data') on the leading stream
            # axis for every chunk plane — the engine's stream sharding
            chunk_sh = engine.chunk_sharding()
            # wire arrays are [S, ...] — place each shard on its own
            # 'data' device row at enqueue so the host never ships a
            # replicated copy of the whole dispatch to every device
            self._wire_sharding = NamedSharding(mesh, P("data"))

        def _dispatch_fn(st, deltas, *wire_arrays):
            # clock rebase (exact: integrate arithmetic uses only ts
            # differences, and the event ts were shifted by the same
            # delta on the host).  int64 is unavailable without x64, so
            # the host splits the shift into two halves <= 2**30
            # (``deltas`` is int32 ``[2]`` or ``[2, S]``) and the device
            # applies two floor-clipped int32 subtractions — no
            # intermediate can underflow (operand >= floor, half <=
            # 2**30, floor - 2**30 > int32 min).  The floor only binds
            # for a pathological gap (>~17.9 min of silence), where it
            # diverges only for a pixel whose surface exceeds
            # 2**30 * leak (~5.4e4 at the eFCN's 5e-5) — tens of
            # thousands of unleaked events on one pixel.
            from async_ev_cnn_tpu.layers.types import IntegrationState

            intgr = st[0]
            d_a, d_b = jnp.asarray(deltas, jnp.int32)
            floor = jnp.int32(-(2**30) + 1)
            new_prev = jnp.maximum(
                jnp.maximum(intgr.prev_ts - d_a, floor) - d_b, floor)
            st = (IntegrationState(intgr.surface, new_prev),) + tuple(st[1:])
            # tier dispatch by shape+dtype sniffing (wire.wire_format):
            # both are static under jit, so this costs nothing traced
            from async_ev_cnn_tpu.utils.wire import wire_format

            chunks = _UNPACKERS[wire_format(wire_arrays)](*wire_arrays)
            if mesh is not None:
                # pipeline layout is stream-leading [S, T, E]; pin the
                # stream axis to 'data' right after the unpack so GSPMD
                # never replicates the expanded planes
                chunks = jax.lax.with_sharding_constraint(chunks, chunk_sh)
            if streams > 1:
                st2, outs = jax.vmap(
                    lambda s, c: net.scan_parallel(jparams, s, c,
                                                   window=window)
                )(st, chunks)
            else:
                st2, outs = net.scan_parallel(jparams, st, chunks,
                                              window=window)
            # tiny checksum for retirement syncs — fetching it is one
            # scalar round trip regardless of output size
            return st2, post(outs), jnp.mean(outs)

        if engine is None:
            self._dispatch = jax.jit(_dispatch_fn)
        else:
            # pin only the state's shardings (the carried operand); the
            # postprocessed outputs and checksum follow GSPMD propagation
            self._dispatch = jax.jit(
                _dispatch_fn,
                out_shardings=(engine.state_shardings(), None, None),
            )

        #: cumulative serve() counters: dispatches enqueued, wire bytes
        #: shipped, valid events consumed
        self.stats = {"dispatches": 0, "wire_bytes": 0, "events": 0}
        # (latency_s, age_s) per retired dispatch for latency_stats()
        self._lat: deque = deque(maxlen=4096)
        self._engine = engine
        # highest wire tier seen so far (WIRE_TIERS rank) — later
        # dispatches never drop back below it, bounding a long-running
        # serve at one compiled program per tier era (see serve())
        from async_ev_cnn_tpu.utils.wire import WIRE_TIERS

        self._era = WIRE_TIERS.get(wire, 0)

    def latency_stats(self) -> dict:
        """Per-dispatch latency observability for deployments.

        ``dispatch_latency_ms``: enqueue -> proven-retired wall time per
        dispatch.  ``event_age_ms``: source-item arrival -> proven-retired
        (staleness of the dispatch's events: host pack + queueing +
        device time).  "Arrival" is the serve loop's pop for raw/wire
        items and the :meth:`prepare` call for PreparedItems (whose
        producer-queue residency is genuine staleness; the dispatch is
        aged from its OLDEST item).  Both are UPPER bounds — retirement
        is proven only
        at the watermark fetches (one per ``max_in_flight/2`` dispatches,
        the engine's backpressure design), so a dispatch that retired
        earlier is credited the fetch time.  Quantiles over the last
        4096 retired dispatches.  The reference prints raw per-step
        times (/root/reference/src/libs/runner.py:92-96); batching
        dispatches made per-step prints meaningless, this is the
        serving-grade replacement.
        """
        if not self._lat:
            return {"n": 0}
        lat = np.array([l for l, _ in self._lat]) * 1e3
        age = np.array([a for _, a in self._lat]) * 1e3

        def q(a):
            return {
                "p50": round(float(np.percentile(a, 50)), 3),
                "p95": round(float(np.percentile(a, 95)), 3),
                "p99": round(float(np.percentile(a, 99)), 3),
                "max": round(float(a.max()), 3),
            }

        return {"n": len(self._lat), "dispatch_latency_ms": q(lat),
                "event_age_ms": q(age)}

    @property
    def state(self):
        """Current per-stream network state (mid-stream serving state —
        checkpointable via utils/checkpoint like any pytree)."""
        return self._state

    @state.setter
    def state(self, new):
        """Install a restored mid-stream state (e.g. from
        ``utils.checkpoint.restore_stream_state(path, pipe.state)``).
        The pytree structure must match the pipeline's.

        Rebase epochs are NOT part of the state pytree: a fresh pipeline
        starts at epoch 0, so a restored RAW endless feed whose absolute
        clock kept running (>~2**30 µs) triggers one capped rebase whose
        ``prev_ts`` shift saturates at the dispatch floor — bounded,
        loud-in-docs behavior: the first dispatch sees a >=17.9-min
        apparent gap (surfaces fully leak-decay, exactly as real
        downtime of that length would), never a wrapped/negative ``dt``.
        Sources whose items restart near ts 0 (file readers, the serve
        CLI) resume exactly."""
        import jax

        if jax.tree.structure(new) != jax.tree.structure(self._state):
            raise ValueError(
                "restored state pytree structure does not match this "
                "pipeline's (different network spec or stream count?)"
            )
        if self._engine is not None:
            # restored leaves are host arrays: place them with the mesh
            # shardings the dispatch was compiled for, or the next call
            # recompiles and ships the state replicated to every device
            new = jax.device_put(new, self._engine.state_shardings())
        self._state = new

    def pack(self, events: np.ndarray, t_chunks: int | None = None):
        """Pack a host ``[N, >=3]`` event array into this pipeline's wire
        tuple.  Public so producer threads can pre-pack (the host stage
        overlaps the device pipe — see :func:`threaded_source`); sources
        may yield either raw event arrays or tuples from this method.

        ``t_chunks`` pads the packed wire to exactly that many chunks
        with zero-count (all-invalid) chunks — exact no-op steps for
        every layer — so every dispatch keeps one static shape and the
        jitted program never recompiles (raises if the events need more
        chunks than ``t_chunks``)."""
        from async_ev_cnn_tpu.utils.wire import (
            WIRE_TIERS,
            pack_wire,
            pack_wire_compact,
            pack_wire_ultra,
            pack_wire_ultra4,
        )

        # under 'auto', never pack below the era floor — once serve()
        # has promoted the pipeline to a higher tier, every lower-tier
        # pack would just be upconverted (cumsum + full plane expansion)
        # in the serial dispatch loop, ~2-3x the host work per item
        era = self._era if self._wire == "auto" else 0
        w = None
        if self._wire == "ultra4" or (
                self._wire == "auto" and era <= WIRE_TIERS["ultra4"]):
            w = pack_wire_ultra4(events, self._capacity,
                                 keep_polarity=self._keep_polarity)
            if w is None and self._wire == "ultra4":
                raise ValueError(
                    "stream does not fit the ultra4 wire (coords >= 256, "
                    "within-chunk ts gap >= 16 us, non-monotone "
                    "within-chunk ts, or capacity < 2); use wire='auto'"
                )
        if w is None and (self._wire == "ultra" or (
                self._wire == "auto" and era <= WIRE_TIERS["ultra"])):
            w = pack_wire_ultra(events, self._capacity,
                                keep_polarity=self._keep_polarity)
            if w is None and self._wire == "ultra":
                raise ValueError(
                    "stream does not fit the ultra wire (coords >= 256, "
                    "within-chunk ts gap >= 256 us, or non-monotone "
                    "within-chunk ts); use wire='auto'"
                )
        if w is None and (self._wire == "compact" or (
                self._wire == "auto" and era <= WIRE_TIERS["compact"])):
            w = pack_wire_compact(events, self._capacity,
                                  keep_polarity=self._keep_polarity)
            if w is None and self._wire == "compact":
                raise ValueError(
                    "stream does not fit the compact wire (coords >= 256 "
                    "or chunk ts span >= 2**16 us); use wire='auto'"
                )
        if w is None:
            w = pack_wire(events, self._capacity,
                          keep_polarity=self._keep_polarity)
        if t_chunks is None:
            t_chunks = self._t_chunks
        if t_chunks is not None:
            t0 = w[0].shape[0]
            if t0 > t_chunks:
                raise ValueError(
                    f"{t0} chunks of {self._capacity} events exceed "
                    f"t_chunks={t_chunks}; feed fewer events per item"
                )
            if t0 < t_chunks:
                w = tuple(
                    np.concatenate(
                        [a, np.zeros((t_chunks - t0, *a.shape[1:]), a.dtype)]
                    )
                    for a in w
                )
        return w

    def _rebase_stream(self, ev: np.ndarray, i: int, out: np.ndarray):
        """Apply stream ``i``'s epoch to a raw event array, advancing the
        epoch (and writing the two int32 ``prev_ts`` shift halves into
        ``out``) when the relative clock passes the rebase threshold."""
        if self._rebase and ev.shape[0]:
            ts64 = ev[:, 2].astype(np.int64) - self._epochs[i]
            if ts64.max() >= _REBASE_AT:
                # rebase so this window starts at 0; the state's prev_ts
                # shifts by the same delta on device (two int32 halves —
                # see _dispatch_fn; a gap past int32 is capped there by
                # the saturating floor)
                d = int(ts64.min())
                if d < 0:
                    raise ValueError(
                        f"stream {i} timestamps regressed below the "
                        "stream's time base (non-monotone source); "
                        "cannot rebase"
                    )
                self._epochs[i] += d
                d_eff = min(d, 2**31)
                out[0] = d_eff // 2
                out[1] = d_eff - d_eff // 2
                ts64 -= d
            if self._epochs[i]:
                ev = ev.astype(np.int64, copy=True)
                ev[:, 2] = ts64
        return ev

    def prepare(self, events: np.ndarray, stream: int = 0,
                t_chunks: int | None = None) -> PreparedItem:
        """Rebase + :meth:`pack` one raw ``[N, >=3]`` item for ``stream``
        on the CALLER's thread, so the expensive host stage overlaps the
        device pipe (see :func:`threaded_source`) even on rebased
        endless feeds — a bare pre-packed wire tuple cannot be rebased
        and :meth:`serve` rejects it once the stream's epoch is nonzero.

        Items for one stream MUST be prepared in serve order by a single
        thread (prepare advances the stream's epoch; the rebase
        bookkeeping is sequential).  One producer thread per stream — or
        one thread for all streams — satisfies this; violations are
        LOUD, not silent: the item records its stream and cumulative
        epoch, and :meth:`serve` raises on a slot/stream mismatch or an
        epoch regression.  Items dropped between prepare and dispatch
        (a ragged multi-stream tail, a consumer exiting serve() early)
        are absorbed — the next dispatched item's epoch gap carries the
        missed ``prev_ts`` shift."""
        deltas = np.zeros(2, np.int32)
        ev = self._rebase_stream(np.asarray(events), stream, deltas)
        return PreparedItem(self.pack(ev, t_chunks), deltas, time.time(),
                            stream, self._epochs[stream])

    def serve(self, source: Iterable) -> Iterator[DispatchResult]:
        """Drive the pipeline over ``source`` — an iterable of host
        ``[N, >=3]`` (y, x, ts, ...) event arrays, of wire tuples
        from :meth:`pack` (pre-packed in producer threads; a
        multi-stream source must then pack consistently, since raw
        events are no longer available for a fallback re-pack), or of
        :class:`PreparedItem` from :meth:`prepare` (producer-side pack
        that also carries the endless-feed rebase, the recommended
        high-throughput shape).  With
        ``streams > 1`` every ``streams`` consecutive items form one
        dispatch and a ragged tail is dropped.  Yields one in-order
        :class:`DispatchResult` per dispatch, each only after its
        retirement on device is proven.  The network state persists
        across calls (stop/resume mid-stream)."""
        it = iter(source)
        in_flight: deque = deque()

        def release(bound):
            # pop down to ``bound``, prove retirement with ONE scalar
            # fetch of the newest popped checksum, then emit in order
            popped = []
            while len(in_flight) > bound:
                popped.append(in_flight.popleft())
            if popped:
                float(popped[-1][2])
                t_ret = time.time()
                for outs, n, _, counts, t_enq, t_arr in popped:
                    self._lat.append((t_ret - t_enq, t_ret - t_arr))
                    yield DispatchResult(outs, n, counts)

        while True:
            if self._streams == 1:
                try:
                    events = next(it)
                except StopIteration:
                    break
                group = [events]
            else:
                group = []
                for _ in range(self._streams):
                    try:
                        group.append(next(it))
                    except StopIteration:
                        break
                if len(group) < self._streams:
                    break  # ragged tail dropped (documented)
            # arrival is stamped AFTER the blocking next(it) calls: a
            # slow/sparse producer's idle time is not event staleness
            # (latency_stats' event_age measures pack+queue+device time
            # of events that exist, not waiting-for-source time).  A
            # PreparedItem's events DO exist from its prepare() call, so
            # its producer-queue residency is genuine staleness — the
            # dispatch's age baseline is the OLDEST such item.
            t_arrival = time.time()
            for ev in group:
                if isinstance(ev, PreparedItem) and ev.t_created is not None:
                    t_arrival = min(t_arrival, ev.t_created)
            deltas = np.zeros((2, self._streams), np.int32)
            wires = []
            for i, ev in enumerate(group):
                if isinstance(ev, PreparedItem):
                    # producer-side prepare() already did the rebase
                    # bookkeeping; the device prev_ts shift is derived
                    # from the epoch ledger (not the item's own deltas)
                    # so items dropped between prepare and dispatch
                    # cannot desynchronize the stream clock
                    if ev.stream is not None and ev.stream != i:
                        raise ValueError(
                            f"dispatch slot {i} received a PreparedItem "
                            f"for stream {ev.stream}: a shared producer "
                            "queue delivered streams out of round-robin "
                            "order — keep one ordered source slot per "
                            "stream"
                        )
                    if ev.epoch is None:  # hand-built: verbatim deltas
                        deltas[:, i] = ev.deltas
                    else:
                        d = ev.epoch - self._applied_epochs[i]
                        if d < 0:
                            raise ValueError(
                                f"stream {i} PreparedItem epoch "
                                f"regressed ({ev.epoch} < "
                                f"{self._applied_epochs[i]} µs): items "
                                "were prepared out of serve order"
                            )
                        d_eff = min(d, 2**31)
                        deltas[0, i] = d_eff // 2
                        deltas[1, i] = d_eff - d_eff // 2
                        self._applied_epochs[i] = ev.epoch
                    wires.append(ev.wire)
                    continue
                if isinstance(ev, tuple):
                    if self._epochs[i]:
                        raise ValueError(
                            f"stream {i} runs on a rebased time base "
                            f"(epoch {self._epochs[i]} us) but received a "
                            "pre-packed wire item, whose time base is "
                            "unknowable — feed raw event arrays (or "
                            "prepare() items) on streams that outlive "
                            "the int32 us range"
                        )
                    wires.append(ev)
                    continue
                ev = self._rebase_stream(np.asarray(ev), i, deltas[:, i])
                # inline rebase dispatches immediately: ledger stays flush
                self._applied_epochs[i] = self._epochs[i]
                wires.append(self.pack(ev))
            # Tier unification, exact and raw-events-free: every tier
            # re-encodes to any higher one on the host (wire_to_tier —
            # ultra's cumsum fits the compact u16 plane by its span gate,
            # compact expands to the plain triple).  Two rules: (1) a
            # mixed group unifies to its highest tier; (2) the pipeline
            # never drops back below the highest tier it has dispatched,
            # so a long-running serve compiles at most one program per
            # tier era (ultra4 -> ultra -> compact -> plain) instead of
            # flip-flopping per item — e.g. one sparse segment whose
            # chunk spans overflow a delta field must not recompile the
            # pipe on every format change.
            from async_ev_cnn_tpu.utils.wire import (
                WIRE_TIERS,
                wire_format,
                wire_to_tier,
            )

            self._era = max(self._era,
                            *(WIRE_TIERS[wire_format(w)] for w in wires))
            tier = next(t for t, r in WIRE_TIERS.items() if r == self._era)
            wires = [wire_to_tier(w, tier) for w in wires]
            ts = {w[0].shape[0] for w in wires}
            if len(ts) > 1:
                raise ValueError(
                    "streams must supply equally many chunks per dispatch "
                    f"(got chunk counts {sorted(ts)}); pad or rebatch the "
                    "source"
                )
            if self._streams == 1:
                wire = wires[0]
                deltas_arg = deltas[:, 0]  # [2] scalars
            else:
                wire = tuple(np.stack(parts) for parts in zip(*wires))
                deltas_arg = deltas  # [2, S]
            # the counts plane: index 2 in the plain triple, 3 in the
            # compact formats (the polarity plane, when present, is last)
            counts = [w[2] if len(w) == 3 else w[3] for w in wires]
            n = sum(int(c.sum()) for c in counts)
            counts = counts[0] if self._streams == 1 else np.stack(counts)
            self.stats["dispatches"] += 1
            self.stats["wire_bytes"] += sum(a.nbytes for a in wire)
            self.stats["events"] += n
            if self._wire_sharding is not None:
                import jax

                wire = jax.device_put(wire, self._wire_sharding)
            self._state, outs, chk = self._dispatch(
                self._state, deltas_arg, *wire)
            in_flight.append((outs, n, chk, counts, time.time(), t_arrival))
            if len(in_flight) >= self._max_in_flight:
                yield from release(self._max_in_flight // 2)
        yield from release(0)


def threaded_source(make_items, fn=None, depth=4,
                    threads=2) -> Iterator[np.ndarray]:
    """Pull items from ``make_items`` (a callable returning a fresh
    iterable of cheap descriptors, e.g. ``lambda: iter(paths)``) through
    ``threads`` background workers with a bounded queue, applying ``fn``
    (the expensive per-item transform, e.g. decode+:meth:`pack`) INSIDE
    the workers — the host stage overlaps the device pipe
    (Prefetcher-style, but for plain iterables).  Workers stride the
    descriptor sequence so the transform runs once per item; ordering
    within a stride is preserved, across workers it is approximate,
    which is fine for independent files."""
    import itertools
    import queue as queue_mod
    import threading

    q: "queue_mod.Queue" = queue_mod.Queue(maxsize=depth)
    stop = threading.Event()
    n_live = threading.Semaphore(0)
    fn = fn if fn is not None else (lambda x: x)

    _ERR = object()  # sentinel: (_ERR, exception) — re-raised in the consumer

    def _put(out):
        while not stop.is_set():
            try:
                q.put(out, timeout=0.1)
                return True
            except queue_mod.Full:
                continue
        return False

    def work(offset):
        try:
            for item in itertools.islice(make_items(), offset, None, threads):
                if not _put(fn(item)):
                    break
        except BaseException as e:  # noqa: BLE001 — propagated, not swallowed
            _put((_ERR, e))
        finally:
            n_live.release()

    for k in range(threads):
        threading.Thread(target=work, args=(k,), daemon=True).start()

    done = 0
    try:
        while True:
            try:
                out = q.get(timeout=0.1)
            except queue_mod.Empty:
                while n_live.acquire(blocking=False):
                    done += 1
                if done == threads and q.empty():
                    return
                continue
            if isinstance(out, tuple) and len(out) == 2 and out[0] is _ERR:
                raise out[1]
            yield out
    finally:
        stop.set()
