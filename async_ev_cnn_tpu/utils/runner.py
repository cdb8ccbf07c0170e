"""Streaming inference runners.

Capability parity with /root/reference/src/libs/runner.py:11-128: iterate
the test set, split each example's event stream into micro-batches by count
(``batch_event_size``) or by time window (``batch_event_usec``), maintain
the integrated frame alongside, feed the network, record wall-clock timings
(running mean every 1000 steps), and optionally display predictions.

TPU-native differences:

* Event micro-batches are padded to a static capacity so the network step
  compiles once; timings synchronize by fetching (a slice of) the result
  to host — on some tunneled backends ``block_until_ready`` returns before
  the computation completes, silently under-measuring.
* ``events/sec`` is reported as the first-class metric next to sec/step.
* The reference passes the *full* event array instead of the micro-batch to
  the network (runner.py:88, a quirk); this runner feeds the micro-batch.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import numpy as np

from async_ev_cnn_tpu.layers.types import EventChunk
from async_ev_cnn_tpu.ops.integrate import integrate_frame_chunked
from async_ev_cnn_tpu.utils import viz
from async_ev_cnn_tpu.utils.transforms import data_transform


def split_micro_batches(events: np.ndarray, batch_event_size=None, batch_event_usec=None):
    """Split an ``[N, 3]`` (y, x, ts) stream into micro-batches.

    By time window when ``batch_event_usec`` is given (runner.py:66-69),
    else by count (runner.py:71-72).
    """
    if events.shape[0] == 0:
        return []  # a fully-cropped-out example is zero micro-batches
    if batch_event_usec is not None:
        # column 2 is ts by the [y, x, ts(, p)] layout — `[:, -1]` read
        # the POLARITY column under keep_polarity, collapsing the whole
        # stream into one bin
        ts = events[:, 2]
        bins = np.arange(0, ts[-1], batch_event_usec)
        bin_ids = np.digitize(ts, bins)
        split_at = np.where(bin_ids[:-1] != bin_ids[1:])[0] + 1
        return np.array_split(events, split_at, axis=0)
    num = int(np.ceil(events.shape[0] / batch_event_size))
    return np.array_split(events, num, axis=0)


class Runner:
    """Base runner: reads batches, micro-batches events, times the network."""

    profile_integration = True  # include frame integration in the timed span
    needs_frame = True  # the event runner ignores the frame; skip its cost

    def __init__(self, args, reader):
        self.args = args
        self.reader = reader
        self.num_classes = reader.num_classes()
        label_to_idx = reader.label_to_idx()
        labels = np.array(list(label_to_idx.keys()))
        order = np.argsort(np.array(list(label_to_idx.values())))
        self.idx_to_label = labels[order]

    def feed_network(self, network, events_batch, frame, reset_state):
        raise NotImplementedError

    def show_frames(self, net_out, frame):  # pragma: no cover - GUI path
        drawn = viz.draw_bboxes(
            net_out, frame, self.args.yolo_num_cells_h, self.args.yolo_num_cells_w,
            self.num_classes, idx_to_label=self.idx_to_label, conf_threshold=0.1,
            nms_threshold=0.0, use_nms=True, max_thickness=1, highlight_top_n=2,
            resize_ratio=5,
        )
        for f in drawn:
            viz.show_frame(f, self.args.frame_delay)

    def run(self, network, max_examples=None, verbose=True):
        """Inference over the test set; returns aggregate timing stats."""
        args = self.args
        step_times = []
        total_events = 0
        n = 0
        num_batches = int(np.ceil(self.reader.test_size() / args.batch_size))
        if max_examples is not None:
            num_batches = min(num_batches, max_examples)

        # the event net does its own integration and ignores `frame`;
        # integrating anyway cost one or more device dispatches per
        # micro-batch of pure waste on the flagship path
        want_frame = self.needs_frame or getattr(args, "show_frames", False)

        for i in range(num_batches):
            t_read = time.time()
            batch = self.reader.next_batch(
                args.batch_size, dataset="test",
                preprocessing_fn=partial(data_transform, args=args),
                concat_features=False, threads=args.reader_threads,
            )
            read_time = time.time() - t_read
            if args.batch_size == 1:
                examples = [batch[1]]
            else:
                # [B, max_len, 3] ragged-padded stack: slice each example
                # by its length (a padding row would integrate as a real
                # event at pixel (0, 0) with ts 0)
                lengths, ev_pad = batch[0], batch[1]
                examples = [ev_pad[b, : int(lengths[b])]
                            for b in range(ev_pad.shape[0])]

            for events in examples:  # each example streams independently
                frame_state = None
                reset_state = True
                for events_batch in split_micro_batches(
                    events, args.batch_event_size, args.batch_event_usec
                ):
                    if self.profile_integration:
                        t0 = time.time()
                    frame = None
                    if want_frame:
                        # chunked: µs-binned micro-batches vary in length
                        # and would recompile the accumulator per size
                        frame, prev_ts = integrate_frame_chunked(
                            events_batch, args.leak, args.frame_h,
                            args.frame_w, frame_state,
                            slice_len=max(256, args.batch_event_size),
                        )
                        frame_state = [frame, prev_ts]
                    if not self.profile_integration:
                        t0 = time.time()

                    net_out = self.feed_network(
                        network, events_batch, frame, reset_state)
                    net_out = np.asarray(net_out)  # host fetch = sync point
                    dt = time.time() - t0
                    step_times.append(dt)
                    total_events += len(events_batch)
                    n += 1
                    if verbose:
                        print(
                            f"Test batch {i + 1:<2} - sec/step: {dt:.4f}  "
                            f"ev/s: {len(events_batch) / max(dt, 1e-9):,.0f}"
                            f"  reading: {read_time:.3f} sec")
                    if n % 1000 == 0 and verbose:
                        print(f"Mean fw time ({n} runs): "
                              f"{np.mean(step_times):.5f}")
                    if getattr(args, "show_frames", False):  # pragma: no cover
                        self.show_frames(np.asarray(net_out), np.asarray(frame))
                    reset_state = False

        times = np.array(step_times[1:] or step_times)  # drop compile step
        return {
            "steps": n,
            "mean_sec_per_step": float(times.mean()),
            "events_per_sec": float(total_events / max(np.array(step_times).sum(), 1e-9)),
            "events_per_sec_steady": float(
                (total_events / max(n, 1)) * len(times) / max(times.sum(), 1e-9)
            ),
        }


class EventRunner(Runner):
    """Drives :class:`YoloEventJax` through its stateful closure
    (``NumpyEventRunner`` analog, runner.py:122-127)."""

    profile_integration = False  # the event net does its own integration
    needs_frame = False  # feed_network ignores it — don't pay for it

    def feed_network(self, network, events_batch, frame, reset_state):
        return network(events_batch, reset_state)


class FrameRunner(Runner):
    """Drives a dense frame network on the accumulated frame per micro-batch
    (``TfFrameRunner``/``NumpyFrameRunner`` analog, runner.py:106-119)."""

    def feed_network(self, network, events_batch, frame, reset_state):
        return network(np.asarray(frame))


class ScanEventRunner(Runner):
    """Throughput mode (TPU-native, no reference analog): pre-chunks the
    whole example into padded ``[T, E]`` chunks and runs one fused
    ``lax.scan`` — one device dispatch per example instead of per
    micro-batch."""

    profile_integration = False

    @staticmethod
    def _pack(events, args):
        """Chunk by count, or by µs bins (padded variable occupancy) when
        ``batch_event_usec`` is set — mirrors split_micro_batches."""
        if getattr(args, "batch_event_usec", None):
            return pack_chunks_usec(
                events, args.batch_event_size, args.batch_event_usec
            )
        return pack_chunks(events, args.batch_event_size)

    def run(self, model, max_examples=None, verbose=True):
        args = self.args
        times, total_events, examples = [], 0, 0
        num_batches = int(np.ceil(self.reader.test_size() / args.batch_size))
        if max_examples is not None:
            num_batches = min(num_batches, max_examples)
        state0 = model.init_state()
        for i in range(num_batches):
            _, events = self.reader.next_batch(
                args.batch_size, dataset="test",
                preprocessing_fn=partial(data_transform, args=args),
                concat_features=False, threads=args.reader_threads,
            )
            chunks = self._pack(events, args)
            t0 = time.time()
            _, outs = model.scan(state0, chunks)
            np.asarray(outs[-1])  # host fetch = true sync point
            dt = time.time() - t0
            times.append(dt)
            total_events += events.shape[0]
            examples += 1
            if verbose:
                print(f"Example {i + 1}: {events.shape[0]} events in {dt:.4f}s "
                      f"({events.shape[0] / max(dt, 1e-9):,.0f} ev/s)")
        steady = np.array(times[1:] or times)
        return {
            "examples": examples,
            "events_per_sec": float(total_events / max(sum(times), 1e-9)),
            "events_per_sec_steady": float(
                (total_events / max(examples, 1)) * len(steady) / max(steady.sum(), 1e-9)
            ),
        }


class MultiStreamRunner(Runner):
    """Serving mode: S independent examples stream concurrently, vmapped
    and sharded over the device mesh (``--num_streams``).  Streams shorter
    than the batch max are padded with all-invalid chunks, which are exact
    no-op steps for every layer."""

    profile_integration = False

    def run(self, model, max_examples=None, verbose=True):
        import jax
        import jax.numpy as jnp

        from async_ev_cnn_tpu.parallel import MultiStreamEngine, make_mesh

        args = self.args
        s = args.num_streams
        n_dev = jax.device_count()
        mesh = make_mesh(n_data=min(s, n_dev), n_model=1)
        eng = MultiStreamEngine(model.net, mesh)
        params = eng.place_params(model.params)

        total_batches = int(np.ceil(self.reader.test_size() / s))
        if max_examples is not None:
            total_batches = min(total_batches, max_examples)
        scan_fn = eng.scan_parallel if model.net.is_all_full else eng.scan
        times, total_events = [], 0
        for i in range(total_batches):
            streams = []
            for _ in range(s):
                _, events = self.reader.next_batch(
                    1, dataset="test",
                    preprocessing_fn=partial(data_transform, args=args),
                    concat_features=False, threads=args.reader_threads,
                )
                streams.append(ScanEventRunner._pack(events, args))
                total_events += events.shape[0]
            t_max = max(c.y.shape[0] for c in streams)
            streams = [pad_chunks_t(c, t_max) for c in streams]
            chunks = jax.tree.map(lambda *xs: jnp.stack(xs, axis=1), *streams)
            states = eng.init_states(params, s)
            kw = {}
            if model.net.is_all_full:
                # honor --window_budget_mb here too (it used to be
                # silently ignored under --num_streams > 1): each device
                # holds ceil(S / n_data) streams' activations at once
                budget = getattr(args, "window_budget_mb", None)
                if budget:
                    per_dev_streams = -(-s // mesh.shape["data"])
                    kw["window"] = model.net.auto_window(
                        t_max, budget / per_dev_streams)
            t0 = time.time()
            states, outs = scan_fn(
                params, states,
                eng.place_chunks(chunks, leading_time=True), **kw)
            np.asarray(outs[-1])  # host fetch = true sync point
            dt = time.time() - t0
            times.append(dt)
            if verbose:
                n_ev = sum(int(np.asarray(c.valid).sum()) for c in streams)
                print(f"Serving batch {i + 1}: {s} streams x {t_max} chunks in "
                      f"{dt:.4f}s ({n_ev / max(dt, 1e-9):,.0f} ev/s)")
        steady = np.array(times[1:] or times)
        per_batch_events = total_events / max(len(times), 1)
        return {
            "examples": total_batches * s,
            "events_per_sec": float(total_events / max(sum(times), 1e-9)),
            "events_per_sec_steady": float(
                per_batch_events * len(steady) / max(steady.sum(), 1e-9)
            ),
        }


def pad_chunks_t(chunks: EventChunk, t: int) -> EventChunk:
    """Pad stacked chunks ``[T0, E]`` to ``[t, E]`` with all-invalid (no-op)
    chunks."""
    t0 = chunks.y.shape[0]
    if t0 == t:
        return chunks
    import jax.numpy as jnp

    def pad(a):
        return jnp.concatenate(
            [a, jnp.zeros((t - t0, *a.shape[1:]), a.dtype)], axis=0
        )

    return EventChunk(*(pad(a) for a in chunks))


def pack_chunks_usec(
    events: np.ndarray, capacity: int, batch_event_usec: int
) -> EventChunk:
    """Pack an ``[N, 3]`` stream into stacked padded chunks ``[T, capacity]``
    binned by time window (the reference's ``batch_event_usec`` micro-batching,
    runner.py:66-69) instead of by count.

    Bins have variable occupancy; each is padded to the static ``capacity``
    with invalid (no-op) events.  A bin holding more than ``capacity`` events
    is split by count — each chunk then spans at most ``batch_event_usec``
    and holds at most ``capacity`` events, so no event is ever dropped.
    """
    import jax.numpy as jnp

    if events.shape[0] == 0:  # one all-invalid (no-op) chunk
        z = jnp.zeros((1, capacity), jnp.int32)
        return EventChunk(y=z, x=z, ts=z, p=z,
                          valid=jnp.zeros((1, capacity), bool))
    pieces = []
    for piece in split_micro_batches(events, batch_event_usec=batch_event_usec):
        if piece.shape[0] <= capacity:
            pieces.append(piece)
        else:
            num = int(np.ceil(piece.shape[0] / capacity))
            pieces.extend(np.array_split(piece, num, axis=0))
    from async_ev_cnn_tpu.layers.types import validate_int32_ts

    validate_int32_ts(events[:, 2])
    t = len(pieces)
    has_p = events.shape[1] > 3
    y = np.zeros((t, capacity), events.dtype)
    x = np.zeros((t, capacity), events.dtype)
    tss = np.zeros((t, capacity), events.dtype)
    p = np.zeros((t, capacity), events.dtype)
    valid = np.zeros((t, capacity), bool)
    for i, piece in enumerate(pieces):
        k = piece.shape[0]
        y[i, :k] = piece[:, 0]
        x[i, :k] = piece[:, 1]
        tss[i, :k] = piece[:, 2]
        if has_p:
            p[i, :k] = piece[:, 3]
        valid[i, :k] = True
    return EventChunk(
        y=jnp.asarray(y, jnp.int32), x=jnp.asarray(x, jnp.int32),
        ts=jnp.asarray(tss, jnp.int32), p=jnp.asarray(p, jnp.int32),
        valid=jnp.asarray(valid),
    )


def pack_chunks(events: np.ndarray, capacity: int) -> EventChunk:
    """Pack an ``[N, >=3]`` (y, x, ts[, p]) stream into stacked padded
    chunks ``[T, capacity]``.  Polarity is carried when the 4th column is
    present (hardcoding p=0 routed every ON event of a 2-channel network
    into channel 0); timestamps go through the shared int32 contract
    checks (a bare cast used to wrap silently where the
    ``EventChunk.from_arrays`` path errors)."""
    from async_ev_cnn_tpu.layers.types import validate_int32_ts

    n = events.shape[0]
    validate_int32_ts(events[:, 2] if n else np.zeros(0, np.int32))
    t = max(1, int(np.ceil(n / capacity)))
    pad = t * capacity - n
    y = np.concatenate([events[:, 0], np.zeros(pad, events.dtype)]).reshape(t, capacity)
    x = np.concatenate([events[:, 1], np.zeros(pad, events.dtype)]).reshape(t, capacity)
    ts = np.concatenate([events[:, 2], np.zeros(pad, events.dtype)]).reshape(t, capacity)
    if events.shape[1] > 3:
        p = np.concatenate([events[:, 3], np.zeros(pad, events.dtype)]
                           ).reshape(t, capacity)
    else:
        p = np.zeros((t, capacity), np.int32)
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)]).reshape(t, capacity)
    import jax.numpy as jnp

    return EventChunk(
        y=jnp.asarray(y, jnp.int32), x=jnp.asarray(x, jnp.int32),
        ts=jnp.asarray(ts, jnp.int32), p=jnp.asarray(p, jnp.int32),
        valid=jnp.asarray(valid),
    )
