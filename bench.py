"""Benchmark: eFCN streaming throughput on the available accelerator.

Prints ONE JSON line:
  {"metric": "events_per_sec_chip", "value": N, "unit": "events/s",
   "vs_baseline": R, ...extras}

Setup mirrors the reference's flagship config
(/root/reference/configs/efcn_event.yml): eFCN at 160x224, leak 5e-5,
capacity-256-packed event chunks, synthetic N-Caltech101-rate stream.
EVERY leg — TPU and both CPU comparators — steps 256 events per
micro-batch (mixed 200-event CPU vs 256-event TPU steps would inflate
the published ratios ~1.28x).

The headline is the fastest streaming execution of the flagship model
that holds the ASYNC-VS-DENSE CONTRACT (BASELINE.md: per-layer <= 1e-4
over 10k steps) ON CHIP — parallel-in-time (``EventNetwork.scan_parallel``)
with the event-scatter Pallas integrate engine, at ``--matmul_precision
default`` (bf16 MXU operands).  Round-4 on-chip drift experiment
(examples/tpu_precision_drift.py, table in docs/performance.md): in the
headline's 'full' execution mode the async path and the dense oracle run
the same convs on the same reconstructed surfaces, so they agree to 0.0
over 10k steps at EVERY precision tier — bf16 is the fastest tier that
holds the contract, hence the honest headline per the round-3 verdict's
own criterion.  Absolute fidelity vs an f32 run is ~1e-2 relative at
bf16 (a serving knob, published alongside as the f32-HIGHEST row).  The
reference-semantics incremental modes are the opposite: they genuinely
drift at bf16 (1.3e-2 > 1e-4 at 10k steps on-chip) and hold at 'high',
so the masked row below stays at HIGHEST and run_networks warns when an
incremental mode is combined with --matmul_precision default.

Also reported, per the honesty contract (SURVEY.md §7 "hard parts"):
  * ``tpu_dense_frame_events_per_sec`` — the dense frame model re-run per
    micro-batch on the integrated frame, sequentially: the TPU analog of
    the reference's dense baseline (/root/reference/src/libs/runner.py:74-88).
  * ``async_dense_masked_events_per_sec`` — the reference-semantics
    incremental path (leak propagation via conv-actfn, masked commits).
    On TPU at this resolution it LOSES to dense recompute — the measured
    crossover is ~0.3 MPix with sparse activity (docs/performance.md).

``vs_baseline`` is measured against the CPU *async* path run in-process:
this framework's own coordinate-list engine
(models/event_numpy_cpu.AsyncEventNumpy), an oracle-verified, vectorized
stand-in for the reference's Cython ``im2col_event`` path — the quantity
the >=10x north star refers to (the reference repo publishes no numbers,
BASELINE.md).  The JSON carries ``baseline_is_standin: true`` to make the
provenance explicit: the reference's own compiled path does not run here
(TF 1.4), and even granting a compiled Cython loop a generous 10x over
the vectorized numpy stand-in would still leave >200x headroom on the
headline ratio.

Timing methodology: the tunneled backend costs ~30 ms per dispatch+fetch
round trip (and the same again per python-level enqueue), device->host
copies run at ~30 MB/s, and ``block_until_ready`` does not synchronize.
Every TPU measurement therefore chains K steps INSIDE one jitted
``lax.scan`` (state feeds forward on-device) and host-fetches one scalar
at the end — the realistic pipelined-serving shape, with exactly one
tunnel round trip per timing (see _chained_events_per_sec).
"""

import json
import os
import sys
import time

import numpy as np

# Outage resilience (round-4 verdict #1): the TPU service has documented
# multi-hour outage windows (CLAUDE.md) where backend init dies UNAVAILABLE
# or a tiny op takes minutes.  Round 4's driver capture was a single-shot
# ``python bench.py`` and lost the round's verified number to one such
# window.  Every entry into the chip now goes through a bounded
# probe-retry loop, and on final failure the script still emits a VALID
# one-line JSON with ``degraded: true`` and exits 0.
BENCH_MAX_WAIT_S = float(os.environ.get("BENCH_MAX_WAIT_S", "2700"))
BENCH_POLL_S = float(os.environ.get("BENCH_POLL_S", "120"))
_BENCH_DEADLINE = [None]  # wall-clock deadline for outage waits, set in main()


def _reset_backend():
    """Drop the cached (possibly failed) backend so the next dispatch
    re-initializes it — JAX caches backend-init *failures* too."""
    try:
        import jax.extend.backend

        jax.extend.backend.clear_backends()
    except Exception:
        pass


def _probe_device():
    """One tiny dispatch+fetch round trip; raises if the backend is down.
    Returns elapsed seconds so callers can flag the slow-sick failure mode
    (outage windows where a 1x1 matmul takes minutes, CLAUDE.md)."""
    import jax.numpy as jnp

    t0 = time.time()
    x = jnp.full((1, 1), 2.0, jnp.float32)
    # explicit raise, not assert: python -O strips asserts, which would
    # strip the only device fetch and silently disable the outage gate
    val = float(np.asarray(x @ x)[0, 0])
    if val != 4.0:
        raise RuntimeError(f"device probe returned {val}, expected 4.0")
    return time.time() - t0


def _wait_for_backend():
    """Block until the accelerator answers a tiny matmul fast enough,
    retrying through outage windows up to the global bench deadline.
    Returns ``None`` when healthy, else the last error string."""
    while True:
        try:
            dt = _probe_device()
            # every probe pays backend init + compile (~20-40 s normal
            # over the tunnel, with wild variance): the first by nature,
            # every retry because the failure path resets the backend
            # cache below.  A tighter "warm" threshold here would
            # misclassify a healthy-but-slow init day as an outage for
            # the whole retry budget.  Anything slower than this is the
            # documented sick-service mode — treat as down and retry.
            if dt < 150.0:
                return None
            last = f"slow backend: tiny matmul took {dt:.0f}s"
        except Exception as e:  # pragma: no cover - requires a real outage
            last = f"{type(e).__name__}: {str(e)[:300]}"
        _reset_backend()
        now = time.time()
        deadline = _BENCH_DEADLINE[0]
        if deadline is None or now >= deadline:
            return last
        wait = min(BENCH_POLL_S, deadline - now)
        print(f"[bench] backend unhealthy; retrying in {int(wait)}s "
              f"({int(deadline - now)}s of budget left): {last}",
              file=sys.stderr)
        time.sleep(wait)


def _resilient(fn, *args, attempts=3, **kwargs):
    """Run a headline leg; on failure wait out the outage and retry.
    Returns ``None`` only when the backend never came back.  The
    optional extras run through the same recovery protocol with
    ``attempts=2`` (one retry) so a mid-run outage blanks as few rows
    as possible without doubling the run length."""
    for attempt in range(attempts):
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # pragma: no cover - requires a real outage
            print(f"[bench] leg {getattr(fn, '__name__', fn)} failed "
                  f"(attempt {attempt + 1}): {type(e).__name__}: "
                  f"{str(e)[:300]}", file=sys.stderr)
            _reset_backend()
            if _wait_for_backend() is not None:
                return None
    return None


def _enable_compilation_cache():
    """Persistent XLA compilation cache — first compile of the big scan over
    a tunneled TPU backend costs minutes; cache it across processes."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()


EFCN_DSL = (
    "conv1=3,3,1,16 pool1=2,2 conv2=3,3,16,32 pool2=2,2 conv3=3,3,32,64 "
    "pool3=2,2 conv4=3,3,64,128 pool4=2,2 conv5=3,3,128,256 pool5=2,2 "
    "conv6=1,1,256,512 conv7=1,1,512,110"
)
H, W = 160, 224
LEAK = 5e-5
CAPACITY = 256
# CPU comparators step the SAME events-per-micro-batch as the TPU legs'
# capacity-packed chunks; a smaller CPU step would inflate the ratios
CHUNK_EVENTS = CAPACITY
T_CHUNKS = 50        # chunks per dispatch for sequential modes
T_PARALLEL = 200     # chunks per dispatch for the parallel-in-time mode
DISPATCHES = 8       # steps chained in-jit per timing


def make_params(layer_defs, rng):
    return {
        key: val
        for name, size in layer_defs.items()
        if "conv" in name
        for key, val in (
            (f"w_{name}", rng.randn(*size[:2], size[2], size[3]).astype(np.float32) * 0.05),
            (f"b_{name}", rng.randn(size[3]).astype(np.float32) * 0.05),
        )
    }


def synth_stream(rng, steps, events_per_step, rate_us=15):
    ts = np.cumsum(rng.randint(1, rate_us, size=steps * events_per_step)).astype(np.int32)
    y = rng.randint(0, H, size=steps * events_per_step).astype(np.int32)
    x = rng.randint(0, W, size=steps * events_per_step).astype(np.int32)
    return np.stack([y, x, ts], axis=-1)


def clustered_stream(rng, steps, events_per_step, radius=8, rate_us=15):
    """Events around a drifting center — real DVS spatial statistics."""
    n = steps * events_per_step
    ts = np.cumsum(rng.randint(1, rate_us, size=n)).astype(np.int32)
    t = np.arange(n) / events_per_step
    cy = H / 2 + H / 3 * np.sin(t * 0.05)
    cx = W / 2 + W / 3 * np.cos(t * 0.04)
    y = np.clip(np.round(cy + rng.randn(n) * radius), 0, H - 1).astype(np.int32)
    x = np.clip(np.round(cx + rng.randn(n) * radius), 0, W - 1).astype(np.int32)
    return np.stack([y, x, ts], axis=-1)


REPS = 5  # timing repetitions per measurement (median-of-REPS reported)


def _chained_events_per_sec(step_fn, state0, chunks, n_events,
                            dispatches=DISPATCHES, reps=REPS):
    """Time ``dispatches`` steps chained INSIDE one jitted ``lax.scan``,
    with one scalar host fetch at the end.

    Why in-jit chaining: on the tunneled backend every *python-level*
    dispatch pays ~30 ms of enqueue latency that does not pipeline — a
    python loop of K dispatches measures mostly the tunnel, not the chip
    (the round-3 first cut of this protocol reported 1.3 M ev/s with
    spread 11 where the in-jit measurement gives ~3-4 M).  Chaining the
    steps inside one program leaves exactly one enqueue+fetch round trip
    (~29 ms) per timing, amortized over K steps; on non-tunneled
    deployments the two protocols agree.  State feeds forward through the
    scan carry (every operand depends on it — no hoisting), and a scalar
    reduction of every step's output rides the carry (nothing is
    dead-code-eliminated; docs/performance.md "measurement discipline").

    Every step consumes a DIFFERENT chunk batch (``chunks`` carries a
    leading ``[dispatches]`` axis the scan iterates over): feeding one
    batch K times would let XLA's while-loop-invariant code motion hoist
    everything that depends only on the events — notably the per-chunk
    ts-map compare, the integrate stage's main cost — out of the loop,
    overstating throughput.  Real serving sees new events every step.

    Statistics: the shared chip shows large run-to-run variance, and
    best-of-N on such a machine systematically reports lucky draws
    (round-2 verdict) — so every number is the MEDIAN of ``reps``
    timings, with ``spread`` = (max - min) / median published alongside.

    Returns ``(events_per_sec_median, seconds_median_per_timing, spread)``.
    """
    import jax
    import jax.numpy as jnp

    assert jax.tree.leaves(chunks)[0].shape[0] == dispatches

    @jax.jit
    def chained(st):
        def body(carry, chunk_t):
            st, acc = carry
            st2, outs = step_fn(st, chunk_t)
            acc = acc + jnp.mean(jax.tree.leaves(outs)[-1])
            return (st2, acc), ()
        (st, acc), _ = jax.lax.scan(body, (st, jnp.float32(0)), chunks)
        return acc

    float(chained(state0))  # compile + sync
    float(chained(state0))  # second warm pass (steady clocks)
    times = []
    for _ in range(reps):
        t0 = time.time()
        float(chained(state0))  # the float() fetch is the only sync point
        times.append(time.time() - t0)
    med = float(np.median(times))
    spread = (max(times) - min(times)) / med if med else 0.0
    return n_events / med, med, spread


def _pack_k(events, capacity, dispatches=DISPATCHES):
    """Pack a stream into chunk leaves with a leading ``[dispatches]``
    axis for the chained timer (each chained step consumes a fresh window
    of the stream).  Returns ``(chunks_k, n_real_events)`` — the ragged
    tail that does not fill ``dispatches`` equal windows is dropped and
    excluded from the event count."""
    import jax
    from async_ev_cnn_tpu.utils.runner import pack_chunks

    import jax.numpy as jnp

    chunks = pack_chunks(events, capacity)
    t_total = chunks.y.shape[0]
    if t_total < dispatches:
        # tiny streams (toy tests): pad with all-invalid chunks — exact
        # no-op steps that contribute zero events
        pad = dispatches - t_total
        chunks = jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((pad, *a.shape[1:]), a.dtype)]
            ),
            chunks,
        )
        t_total = dispatches
    t_step = t_total // dispatches
    kept = t_step * dispatches
    chunks = jax.tree.map(lambda a: a[:kept], chunks)
    n_events = int(np.asarray(chunks.valid).sum())
    chunks_k = jax.tree.map(
        lambda a: a.reshape(dispatches, t_step, *a.shape[1:]), chunks
    )
    return chunks_k, n_events


def _net(layer_defs, conv_mode, activation_dtype="float32",
         stem_fusion=None):
    """Bench nets run with the s2d stem fusion on for the f32-activation
    legs: at the bf16 headline matmul tier the fusion is exact
    (fused-vs-direct diff 0.0) and wins the whole parallel-in-time step
    1.15x (examples/stem_bf16_retest.py, 2026-08-19 — the measurement
    that flipped ``ops.stem.allow_demoted_precision``).  The bf16
    ACTIVATION-storage leg stays unfused: its own on-chip A/B
    (examples/stem_bf16act_ab.py, 2026-08-19) measured the fusion a
    slight LOSS there (9.27M fused vs 9.39-9.50M unfused ev/s — the
    storage cast already halves conv1's round trip, so the fusion's
    HBM saving no longer pays for the s2d reshuffle), with parity
    exactly 0.0.  Fusion only ever applies to 'full'-mode conv+pool stem pairs
    (ops/stem.py), so passing it for the incremental modes is a no-op.
    ``stem_fusion=None`` uses the library's 'auto', whose trace-time
    predicate encodes exactly that measured regime (demoted tier x f32
    activations — EventNetwork._fusion_active); a bool overrides it
    (the A/B scripts' hook)."""
    from async_ev_cnn_tpu.layers.network import EventNetwork

    if stem_fusion is None:
        stem_fusion = "auto"
    return EventNetwork(layer_defs, H, W, leak=LEAK, alpha=0.1, padding="SAME",
                        conv_mode=conv_mode, stem_fusion=stem_fusion,
                        activation_dtype=activation_dtype)


def bench_tpu_parallel(params, layer_defs, events, dispatches=DISPATCHES,
                       activation_dtype="float32"):
    """Headline: parallel-in-time streaming (full mode + surface-scan
    kernel + time-batched network).  The stream is split into
    ``dispatches`` equal windows; each chained step consumes a fresh
    one.  ``dispatches`` > the protocol's 8 amortizes the single ~30 ms
    tunnel RTT further — the K=32 leg is published separately as the
    co-located deployment projection, NOT as the headline.

    ``activation_dtype='bfloat16'`` (bf16 inter-layer activation
    storage, ~1.26x) is likewise a separately-published serving row, not
    the headline: it fails the 10k-step <=1e-4 absolute contract by one
    bf16 ulp (3.1e-2 at pool5 once in 10k on-chip steps — f32
    accumulation noise occasionally crosses a bf16 rounding boundary,
    irreducible for any absolute gate at O(1) magnitudes)."""
    import jax
    import jax.numpy as jnp

    net = _net(layer_defs, "full", activation_dtype=activation_dtype)
    jparams = {k: jnp.asarray(v) for k, v in params.items()}
    state = net.init_state(jparams)
    chunks, n_events = _pack_k(events, CAPACITY, dispatches=dispatches)
    fn = jax.jit(lambda s, c: net.scan_parallel(jparams, s, c))
    return _chained_events_per_sec(fn, state, chunks, n_events,
                                   dispatches=dispatches)


def _at_precision(precision, fn, *args, **kwargs):
    """Run a bench leg at a matmul precision, restoring whatever tier was
    active at entry (restoring a hardcoded default would silently reset
    an ambient non-default tier for everything built afterwards)."""
    from jax.lax import Precision

    from async_ev_cnn_tpu.ops.conv import matmul_precision, set_matmul_precision

    prev = {Precision.HIGHEST: "highest", Precision.HIGH: "high",
            Precision.DEFAULT: "default"}[matmul_precision()]
    set_matmul_precision(precision)
    try:
        return fn(*args, **kwargs)
    finally:
        set_matmul_precision(prev)


HEADLINE_PRECISION = "default"  # fastest tier that holds the 10k contract
                                # in the headline mode (round-4 on-chip
                                # drift experiment)


def bench_tpu_dense_frame(params, layer_defs, events):
    """The dense baseline the async idea is meant to beat: re-run the dense
    frame network per event micro-batch on the integrated frame,
    sequentially (reference runner.py:74-88).  Executed as the full-mode
    sequential scan — integrate chunk, one conv per layer, repeat."""
    import jax
    import jax.numpy as jnp

    net = _net(layer_defs, "full")
    jparams = {k: jnp.asarray(v) for k, v in params.items()}
    state = net.init_state(jparams)
    chunks, n_events = _pack_k(events, CAPACITY)
    fn = jax.jit(lambda s, c: net.scan(jparams, s, c))
    return _chained_events_per_sec(fn, state, chunks, n_events)


def bench_tpu_async(params, layer_defs, events, conv_mode="dense"):
    """Reference-semantics incremental path (masked commits, conv-actfn
    leak propagation) — or any other conv_mode."""
    import jax
    import jax.numpy as jnp

    net = _net(layer_defs, conv_mode)
    jparams = {k: jnp.asarray(v) for k, v in params.items()}
    state = net.init_state(jparams)
    chunks, n_events = _pack_k(events, CAPACITY)
    fn = jax.jit(lambda s, c: net.scan(jparams, s, c))
    return _chained_events_per_sec(fn, state, chunks, n_events)


def bench_tpu_serving(params, layer_defs, events, n_streams=8,
                      activation_dtype="float32", stem_fusion=None):
    """Multi-stream serving on one chip: S independent streams, each
    parallel-in-time, vmapped into one time*stream-batched program.

    Returns ``(aggregate_events_per_sec, latency_sec_per_dispatch, spread)``
    — latency is the median wall time of one chained batch step (T_CHUNKS
    chunks per stream), including ~1/dispatches of the tunnel round
    trip.  ``stem_fusion`` is the A/B hook; None (the default) matches
    the library serving engine's policy — unfused under the vmapped
    multi-stream shape, where the single-stream-measured fusion
    regresses 28-40% (2026-08-19 capture; StreamingPipeline applies the
    same override for streams > 1, utils/serving.py)."""
    import jax
    import jax.numpy as jnp

    net = _net(layer_defs, "full", activation_dtype=activation_dtype,
               stem_fusion=False if stem_fusion is None else stem_fusion)
    jparams = {k: jnp.asarray(v) for k, v in params.items()}
    base = net.init_state(jparams)
    states = jax.tree.map(lambda x: jnp.broadcast_to(x, (n_streams, *x.shape)), base)
    # [K, T, E] -> [K, S, T, E]: every chained step sees fresh chunks,
    # broadcast across the streams
    chunks, n_events = _pack_k(events, CAPACITY)
    chunks = jax.tree.map(
        lambda a: jnp.broadcast_to(a[:, None], (a.shape[0], n_streams, *a.shape[1:])),
        chunks,
    )
    fn = jax.jit(jax.vmap(lambda s, c: net.scan_parallel(jparams, s, c)))
    eps, dt, spread = _chained_events_per_sec(
        fn, states, chunks, n_events * n_streams
    )
    return eps, dt / DISPATCHES, spread


def bench_tpu_serving_saturation(params, layer_defs, events,
                                 streams=(8, 16, 32, 64),
                                 activation_dtype="float32"):
    """Serving saturation sweep: aggregate throughput + per-dispatch latency
    for each stream count; the round-2 verdict flagged that the bench JSON
    carried only S=8 while the measured chip saturation (~4.9M ev/s at
    S>=16) lived only in the docs.  Round 4 extended the sweep to S=64
    and added an ``activation_dtype='bfloat16'`` variant sweep (the two
    serving knobs compound).  The round-5 knee probe
    (examples/serving_knee_probe.py) located both envelopes' peaks:
    f32-act peaks AT S=64 (S=96 is slower, S=128 OOMs), while bf16-act
    keeps rising to S=128 (~19.6M ev/s, ~1.13x its S=64 row; S=192
    drops again) — so the bf16 variant sweep includes S=128.
    Returns a dict with the per-S rows and the peak."""
    rows = []
    for s in streams:
        eps, lat, spread = bench_tpu_serving(params, layer_defs, events,
                                             n_streams=s,
                                             activation_dtype=activation_dtype)
        rows.append({
            "streams": s,
            "events_per_sec": round(eps, 1),
            "latency_ms_per_dispatch": round(lat * 1e3, 3),
            "spread": round(spread, 3),
        })
    peak = max(rows, key=lambda r: r["events_per_sec"])
    return {
        "sweep": rows,
        "peak_events_per_sec": peak["events_per_sec"],
        "peak_streams": peak["streams"],
        "peak_latency_ms_per_dispatch": peak["latency_ms_per_dispatch"],
    }


def bench_sustained_pipeline(params, layer_defs, seconds=25,
                             files=24, chunks_per_dispatch=1000,
                             force_wire=None, max_in_flight=16,
                             streams=1, window="t_parallel",
                             stem_fusion=None, activation_dtype="float32"):
    """Sustained FILE -> network pipeline: on-disk N-data tree -> native
    decode -> vectorized packing -> wire upload (utils/wire.py 'auto':
    2.5 B/event ultra4 -> 3 B ultra -> 4 B compact -> 8 B plain, the
    smallest tier the stream fits) -> parallel-in-time network, for
    >= ``seconds`` of wall
    time.  The reference's flagship loop is file->network in one process
    (/root/reference/src/libs/runner.py:49-103); the round-3 verdict
    flagged that ingest (56M ev/s native) and device serving (~4-5M ev/s)
    were each measured but never as ONE sustained pipe.

    The loop is the library serving engine
    (:class:`async_ev_cnn_tpu.utils.serving.StreamingPipeline`):
    producer threads decode+pack ahead, dispatches chain on-device, and
    a bounded in-flight window is released by one tail fetch per
    half-window.  Returns ``(events_per_sec, host_events_per_sec,
    wire_mbps, dispatches, latency_stats)`` where ``host_events_per_sec``
    is the decode+pack stage alone (one pass, one thread, no device) and
    ``latency_stats`` the pipeline's per-dispatch latency/event-age
    quantiles (:meth:`StreamingPipeline.latency_stats`).

    On this tunneled dev chip the link (~30-40 MB/s) is the binding
    stage (measured: host 51M ev/s, device ~7.5M, 8 B-wire pipe 4.8M);
    the compact wire doubles the link-bound ceiling.  The number is
    honest end-to-end — on a co-located deployment (PCIe ~10 GB/s) the
    same pipe is compute-bound.

    ``streams > 1`` runs the multi-camera serving shape: each dispatch
    stacks ``streams`` per-file wires on a leading axis and vmaps the
    network over per-stream state (device throughput saturates with
    streams — the serving sweep — while the wire cost grows linearly,
    so pick ``chunks_per_dispatch`` so streams*chunks stays ~1-2k).
    """
    import tempfile

    from async_ev_cnn_tpu.data.file_reader import NReader
    from async_ev_cnn_tpu.utils.serving import (
        StreamingPipeline,
        threaded_source,
    )

    events_per_file = chunks_per_dispatch * CAPACITY
    rng = np.random.RandomState(7)
    reader = NReader()
    with tempfile.TemporaryDirectory() as root:
        paths = []
        for i in range(files):
            ev = clustered_stream(rng, chunks_per_dispatch, CAPACITY)
            path = f"{root}/f{i:03d}.bin"
            # N-data y is uint8 (max 239 is the overflow marker, <=238 ok);
            # fold the 160-row frame directly
            reader.save_example(path, ev[:, 1] % 224, ev[:, 0] % 160,
                                ev[:, 2], np.zeros(len(ev), np.int32))
            paths.append(path)

        def decode(path):
            _, x, y, ts, _ = reader.read_example(path)
            return np.stack([y % H, x % W, ts], axis=-1)

        # the serving engine IS the library component (utils/serving.py):
        # wire compression, chained dispatches, bounded in-flight window
        # with the one-fetch watermark drain (rationale + the measured
        # failure modes of the alternatives live in its module docstring)
        net = _net(layer_defs, "full", activation_dtype=activation_dtype,
                   stem_fusion=stem_fusion)
        # pass through to StreamingPipeline's VALIDATED wire argument —
        # a silent anything-else->'plain' mapping turned force_wire='auto'
        # (or a typo) into the 8 B wire, halving the link-bound leg.
        # 'auto' negotiates per item (ultra4 -> ultra -> compact ->
        # plain) and the
        # pipeline's era never drops below a dispatched tier, so no
        # first-file pre-check is needed.
        wire = "auto" if force_wire is None else force_wire
        # late-bound default (module constant may be monkeypatched in the
        # toy-scale smoke tests).  window=200 over 1000-chunk dispatches
        # is the measured winner on the tunneled chip: the ultra-tier pipe
        # is link-bound and the un-windowed program achieves a LOWER link
        # rate (examples/pipe_window_probe.py, 2026-08-19 negative) —
        # window=None applies on co-located deployments where the device
        # side binds (the T-scaling curve, docs/performance.md).
        if window == "t_parallel":
            window = T_PARALLEL
        pipe = StreamingPipeline(net, params, capacity=CAPACITY,
                                 window=window, streams=streams,
                                 max_in_flight=max_in_flight, wire=wire)

        def decode_pack(path):
            return pipe.pack(decode(path))

        # host-only stage rate (decode + pack, one pass, one thread)
        t0 = time.time()
        for path in paths:
            decode_pack(path)
        host_eps = files * events_per_file / (time.time() - t0)

        # warm compile outside the timed window
        for _ in pipe.serve([decode_pack(paths[0])] * streams):
            pass

        # producers decode+pack ahead of the device pipe (the compact
        # packer runs ~11-19M ev/s per thread — one thread leaves no
        # headroom over a multi-M ev/s pipe); the deadline stops the
        # source, serve() then drains the in-flight tail, and the
        # drained tail stays inside the timed window
        deadline = [None]

        def path_gen():
            i = 0
            while deadline[0] is None or time.time() < deadline[0]:
                yield paths[i % files]
                i += 1

        src = threaded_source(path_gen, fn=decode_pack,
                              depth=max(3, streams + 2), threads=2)
        stats0 = dict(pipe.stats)
        t0 = time.time()
        deadline[0] = t0 + seconds
        n_events = 0
        for res in pipe.serve(src):
            n_events += res.n_events
        dt = time.time() - t0
        n_dispatches = pipe.stats["dispatches"] - stats0["dispatches"]
        wire_bytes = pipe.stats["wire_bytes"] - stats0["wire_bytes"]
        latency = pipe.latency_stats()
    return n_events / dt, host_eps, wire_bytes / dt / 1e6, n_dispatches, latency


def bench_cpu_dense_proxy(params, layer_defs, events, steps=5):
    """Reference-style dense numpy eFCN per micro-batch on the integrated
    frame (the efcn_frame_np path, runner.py:74-88)."""
    from async_ev_cnn_tpu.models import YoloFrameNumpy

    n_pools = sum(1 for name in layer_defs if "pool" in name)
    h_cells, w_cells = H >> n_pools, W >> n_pools
    out_c = [s[3] for n, s in layer_defs.items() if "conv" in n][-1]
    model = YoloFrameNumpy(
        h_frame=H, w_frame=W, num_classes=out_c - 10, cnn_layers=layer_defs,
        cnn_padding="SAME", h_cells=h_cells, w_cells=w_cells, num_bbox=2,
        alpha=0.1, leak=LEAK,
    )
    model.set_weights(params)
    # steady-state: integrate first, time only the network forward like the
    # reference's profile_integration=True runners
    frame = np.random.RandomState(0).rand(H, W).astype(np.float32)
    model.forward(frame)  # warm numpy caches
    t0 = time.time()
    for _ in range(steps):
        model.forward(frame)
    dt = (time.time() - t0) / steps
    return CHUNK_EVENTS / dt, dt


def bench_cpu_async_baseline(params, layer_defs, events, max_chunks=15,
                             reps=3):
    """The reference-style CPU *async* path: this framework's own
    coordinate-list engine (models/event_numpy_cpu.py), a vectorized,
    oracle-verified stand-in for the Cython im2col_event path — the quantity
    the >=10x north star actually refers to.

    Best-of-``reps``: the denominator of ``vs_baseline`` must not be
    deflated by transient host load (a loaded-host draw once halved it,
    doubling the published ratio) — taking the fastest rep is the
    conservative direction for the ratio."""
    from async_ev_cnn_tpu.models.event_numpy_cpu import AsyncEventNumpy

    model = AsyncEventNumpy(layer_defs, params, H, W, LEAK, alpha=0.1, padding="SAME")
    chunks = [events[i : i + CHUNK_EVENTS]
              for i in range(0, len(events), CHUNK_EVENTS)][:max_chunks]
    model.step(chunks[0])  # warm caches
    best = 0.0
    for _ in range(reps):
        t0 = time.time()
        n = 0
        for ch in chunks[1:]:
            model.step(ch)
            n += len(ch)
        dt = time.time() - t0
        best = max(best, n / dt)
    return best


def run_profile_layers():
    """--profile layers: per-layer ms attribution on the current device."""
    import jax.numpy as jnp
    from async_ev_cnn_tpu.utils.config import layers_dict
    from async_ev_cnn_tpu.utils.profiling import profile_layers
    from async_ev_cnn_tpu.utils.runner import pack_chunks

    layer_defs = layers_dict(EFCN_DSL)
    rng = np.random.RandomState(0)
    params = {k: jnp.asarray(v) for k, v in make_params(layer_defs, rng).items()}
    events = synth_stream(rng, T_CHUNKS, CHUNK_EVENTS)
    chunks = pack_chunks(events, CAPACITY)
    for mode in ("dense", "full"):
        net = _net(layer_defs, mode)
        print(f"\nconv_mode={mode} (ms/chunk, marginal per layer)")
        for name, ms in profile_layers(net, params, chunks):
            print(f"  {name:>8}: {ms:7.3f}")

    from async_ev_cnn_tpu.utils.profiling import profile_layers_parallel

    events_par = synth_stream(rng, T_PARALLEL, CHUNK_EVENTS)
    chunks_par = pack_chunks(events_par, CAPACITY)
    net = _net(layer_defs, "full")
    print(f"\nparallel-in-time path, T={T_PARALLEL} "
          f"(ms/dispatch, marginal per stage)")
    for name, ms in profile_layers_parallel(net, params, chunks_par):
        print(f"  {name:>9}: {ms:7.3f}")


def main():
    from async_ev_cnn_tpu.ops.conv import set_matmul_precision
    from async_ev_cnn_tpu.utils.config import layers_dict

    _BENCH_DEADLINE[0] = time.time() + BENCH_MAX_WAIT_S

    layer_defs = layers_dict(EFCN_DSL)
    rng = np.random.RandomState(0)
    params = make_params(layer_defs, rng)
    # DISPATCHES distinct stream windows per measurement: ~T_PARALLEL
    # (resp. T_CHUNKS) capacity-packed chunks per chained step
    events_par = synth_stream(rng, DISPATCHES * T_PARALLEL, CAPACITY)
    events = events_par[: DISPATCHES * T_CHUNKS * CAPACITY]

    # headline tier (round-4 drift experiment, module docstring): the
    # whole headline family (parallel, dense baseline, serving, T400,
    # pipeline) runs at one consistent precision
    set_matmul_precision(HEADLINE_PRECISION)

    # CPU comparators first — they need no accelerator and must survive
    # a degraded (outage) run so the JSON still carries the baselines.
    # Record the host load alongside: best-of-3 shields against a
    # transient spike, but a SUSTAINED co-running load depresses all
    # reps and silently inflates vs_baseline (observed 2026-08-19: a
    # concurrent test suite halved the stand-in to 1.3k ev/s) — the
    # load figure lets a reader tell a polluted draw from an idle one.
    baseline_load = round(os.getloadavg()[0] / (os.cpu_count() or 1), 2)
    cpu_eps, cpu_dt = bench_cpu_dense_proxy(params, layer_defs, events)
    cpu_async_eps = bench_cpu_async_baseline(params, layer_defs, events)

    # gate on a healthy backend (bounded retry through outage windows),
    # then run the two headline legs with mid-run outage recovery
    reason = _wait_for_backend()
    tpu = None if reason else _resilient(
        bench_tpu_parallel, params, layer_defs, events_par)
    if tpu is None:
        # the service never came back inside the budget: emit a VALID
        # degraded JSON line (driver contract: rc=0, parseable) so the
        # round records the outage instead of an rc=1 with no output
        print(json.dumps({
            "metric": "events_per_sec_chip",
            "value": 0.0,
            "unit": "events/s",
            "vs_baseline": 0.0,
            "degraded": True,
            "reason": reason or "headline leg failed after backend retries",
            "wait_budget_s": BENCH_MAX_WAIT_S,
            "baseline_is_standin": True,
            "baseline_host_load_per_cpu": baseline_load,
            "baseline_cpu_async_events_per_sec": round(cpu_async_eps, 1),
            "baseline_cpu_dense_numpy_events_per_sec": round(cpu_eps, 1),
            "config": "efcn_event (160x224, leak 5e-5, capacity-256-packed "
                      "chunks)",
        }))
        return
    tpu_eps, _, tpu_spread = tpu
    dense = _resilient(bench_tpu_dense_frame, params, layer_defs, events)
    dense_eps = dense[0] if dense else None

    # optional extras must never cost the driver the headline JSON line:
    # same recovery protocol as the headline legs, one retry each
    def _try(fn, *a, **kw):
        return _resilient(fn, *a, attempts=2, **kw)

    # the reference-semantics incremental path drifts past the 1e-4 gate
    # at bf16 (10k steps on-chip) — its rows stay at the tier it passes
    masked = _try(_at_precision, "highest", bench_tpu_async,
                  params, layer_defs, events)
    masked_eps = masked[0] if masked else None
    f32 = _try(_at_precision, "highest", bench_tpu_parallel,
               params, layer_defs, events_par)
    f32_eps = f32[0] if f32 else None
    high = _try(_at_precision, "high", bench_tpu_parallel,
                params, layer_defs, events_par)
    high_eps = high[0] if high else None
    serving = _try(bench_tpu_serving_saturation, params, layer_defs, events)
    # the bf16-activation serving sweep (opt-in knob; compounds with
    # stream saturation — see bench_tpu_parallel's docstring for why it
    # is not the headline); the knee probe put its peak at S=128
    serving16 = _try(bench_tpu_serving_saturation, params, layer_defs,
                     events, streams=(32, 64, 128),
                     activation_dtype="bfloat16")
    events_400 = synth_stream(rng, DISPATCHES * 2 * T_PARALLEL, CAPACITY)
    t400 = _try(bench_tpu_parallel, params, layer_defs, events_400)
    t400_eps = t400[0] if t400 else None
    # serving knob row: bf16 inter-layer activation storage (~1.26x; one
    # bf16-ulp deviation bound, fails the 1e-4 absolute contract — see
    # bench_tpu_parallel docstring); NOT the headline
    act16 = _try(bench_tpu_parallel, params, layer_defs, events_par,
                 activation_dtype="bfloat16")
    act16_eps = act16[0] if act16 else None
    # deployment projection: the K=8 protocol timing still contains one
    # ~30 ms tunnel RTT (~half the measured per-dispatch time at bf16);
    # chaining K=32 shrinks that measurement artifact to ~12% — the rate
    # a co-located (non-tunneled) deployment of the SAME program would
    # see.  Published as a separate field; the headline stays K=8.
    events_k32 = synth_stream(rng, 32 * T_PARALLEL, CAPACITY)
    k32 = _try(bench_tpu_parallel, params, layer_defs, events_k32,
               dispatches=32)
    k32_eps = k32[0] if k32 else None
    # ... and the same projection with the bf16-activation serving knob:
    # the best single-stream number the chip reaches (measured ~17.8M
    # ev/s; ex-RTT ~2.0 ms/dispatch — at the analytic bf16 MXU floor,
    # docs/performance.md "bf16-tier floor")
    k32_act16 = _try(bench_tpu_parallel, params, layer_defs, events_k32,
                     dispatches=32, activation_dtype="bfloat16")
    k32_act16_eps = k32_act16[0] if k32_act16 else None
    # throughput-oriented projection: T=1600 chunks per dispatch (8x the
    # headline's T=200; the largest T the tunnel's compile path accepts)
    # amortizes the per-dispatch state HBM round trip inside the chip on
    # top of the RTT — the measured single-stream envelope top
    # (examples/t_scaling_probe.py: 21.8M ev/s).  410k events/dispatch
    # trades dispatch latency for rate; the latency rows stay T=200.
    events_t1600 = synth_stream(rng, 32 * 8 * T_PARALLEL, CAPACITY)
    t1600 = _try(bench_tpu_parallel, params, layer_defs, events_t1600,
                 dispatches=32, activation_dtype="bfloat16")
    t1600_eps = t1600[0] if t1600 else None
    # ... and the same T=1600 shape at f32 activations: the fastest
    # measured execution that holds the 10k-step <=1e-4 absolute
    # contract (bf16-act does not; the T=200 K=8 headline stays the
    # protocol row for round-over-round comparability)
    t1600_f32 = _try(bench_tpu_parallel, params, layer_defs, events_t1600,
                     dispatches=32)
    t1600_f32_eps = t1600_f32[0] if t1600_f32 else None
    clustered = clustered_stream(rng, DISPATCHES * T_CHUNKS, CAPACITY)
    window = _try(_at_precision, "highest", bench_tpu_async,
                  params, layer_defs, clustered, conv_mode="window")
    window_eps = window[0] if window else None
    pipeline = _try(bench_sustained_pipeline, params, layer_defs)
    # the multi-camera serving shape of the same pipe (4 streams vmapped
    # per dispatch, same total chunks) — exercises the library engine's
    # multi-stream leg on the real chip
    pipeline4 = _try(bench_sustained_pipeline, params, layer_defs,
                     seconds=12, chunks_per_dispatch=500, streams=4,
                     files=32)
    # the same single-stream pipe with the bf16 activation-storage knob:
    # at the ultra4 wire tier the pipe is DEVICE-bound (the 2.5 B wire
    # un-link-bound it), so the knob's ~1.3x device-rate win applies to
    # the honest end-to-end number too (same one-ulp deviation bound as
    # every other bf16-act row; NOT the headline)
    pipeline16 = _try(bench_sustained_pipeline, params, layer_defs,
                      seconds=12, activation_dtype="bfloat16")

    import jax

    print(json.dumps({
        "metric": "events_per_sec_chip",
        "value": round(tpu_eps, 1),
        "unit": "events/s",
        "vs_baseline": round(tpu_eps / cpu_async_eps, 2),
        "spread": round(tpu_spread, 3),
        "protocol": f"median of {REPS} x {DISPATCHES} chained dispatches",
        "device": str(jax.devices()[0]),
        "mode": "parallel-in-time streaming (scan_parallel, event-scatter "
                "integrate engine; async==dense 0.0 over 10k on-chip steps "
                "at this tier)",
        "matmul_precision": HEADLINE_PRECISION,
        "tpu_dense_frame_events_per_sec":
            round(dense_eps, 1) if dense_eps else None,
        "vs_tpu_dense_frame":
            round(tpu_eps / dense_eps, 2) if dense_eps else None,
        "async_dense_masked_events_per_sec":
            round(masked_eps, 1) if masked_eps else None,
        "parallel_f32_highest_events_per_sec":
            round(f32_eps, 1) if f32_eps else None,
        "parallel_high_precision_events_per_sec":
            round(high_eps, 1) if high_eps else None,
        "serving_events_per_sec_chip_8streams":
            serving["sweep"][0]["events_per_sec"] if serving else None,
        "serving_saturation_events_per_sec":
            serving["peak_events_per_sec"] if serving else None,
        "serving_saturation_streams":
            serving["peak_streams"] if serving else None,
        "serving_saturation_latency_ms_per_dispatch":
            serving["peak_latency_ms_per_dispatch"] if serving else None,
        "serving_sweep": serving["sweep"] if serving else None,
        "serving_bf16_act_saturation_events_per_sec":
            serving16["peak_events_per_sec"] if serving16 else None,
        "serving_bf16_act_sweep": serving16["sweep"] if serving16 else None,
        "parallel_T400_events_per_sec":
            round(t400_eps, 1) if t400_eps else None,
        "parallel_rtt_amortized_K32_events_per_sec":
            round(k32_eps, 1) if k32_eps else None,
        "parallel_bf16_act_events_per_sec":
            round(act16_eps, 1) if act16_eps else None,
        "parallel_bf16_act_K32_events_per_sec":
            round(k32_act16_eps, 1) if k32_act16_eps else None,
        "parallel_bf16_act_T1600_K32_events_per_sec":
            round(t1600_eps, 1) if t1600_eps else None,
        "parallel_T1600_K32_events_per_sec":
            round(t1600_f32_eps, 1) if t1600_f32_eps else None,
        "window_mode_clustered_events_per_sec":
            round(window_eps, 1) if window_eps else None,
        "sustained_pipeline_events_per_sec":
            round(pipeline[0], 1) if pipeline else None,
        "sustained_pipeline_host_stage_events_per_sec":
            round(pipeline[1], 1) if pipeline else None,
        "sustained_pipeline_wire_MBps":
            round(pipeline[2], 2) if pipeline else None,
        # negotiated wire tier, as bytes/event (2.5 = ultra4, 3 = ultra,
        # 4 = compact, 8 = plain, + ~0.03 chunk overhead) — the
        # link-bound leg's throughput is this times the link rate
        "sustained_pipeline_wire_B_per_event":
            round(pipeline[2] * 1e6 / pipeline[0], 2)
            if pipeline and pipeline[0] else None,
        "sustained_pipeline_dispatches":
            pipeline[3] if pipeline else None,
        # per-dispatch latency + event staleness (upper bounds — proven
        # at watermark fetches), from the serving engine's own counters
        "sustained_pipeline_latency_ms":
            pipeline[4].get("dispatch_latency_ms") if pipeline else None,
        "sustained_pipeline_event_age_ms":
            pipeline[4].get("event_age_ms") if pipeline else None,
        "sustained_pipeline_4stream_events_per_sec":
            round(pipeline4[0], 1) if pipeline4 else None,
        "sustained_pipeline_bf16_act_events_per_sec":
            round(pipeline16[0], 1) if pipeline16 else None,
        "sustained_pipeline_bf16_act_wire_MBps":
            round(pipeline16[2], 2) if pipeline16 else None,
        "baseline_is_standin": True,
        "baseline_host_load_per_cpu": baseline_load,
        "baseline_cpu_async_events_per_sec": round(cpu_async_eps, 1),
        "baseline_cpu_dense_numpy_events_per_sec": round(cpu_eps, 1),
        "vs_cpu_dense": round(tpu_eps / cpu_eps, 2),
        "config": "efcn_event (160x224, leak 5e-5, capacity-256-packed chunks)",
    }))


if __name__ == "__main__":
    import sys

    if "--profile" in sys.argv:
        run_profile_layers()
    else:
        main()
