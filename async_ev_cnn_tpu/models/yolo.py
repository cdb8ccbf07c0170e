"""The three network variants, mirroring the reference's model surface:

* :class:`YoloEventJax`   — async event-driven network (the flagship),
  TPU-native analog of ``YoloEventNumpy``
  (/root/reference/src/models/event_numpy.py:12-105).
* :class:`YoloFrameJax`   — dense frame network, one jitted XLA program,
  analog of ``YoloFrameTf`` (src/models/frame_tf.py:11-127).
* :class:`YoloFrameNumpy` — dense pure-numpy oracle / CPU baseline, analog
  of ``YoloFrameNumpy`` (src/models/frame_numpy.py:9-106).

All three share the constructor signature of the reference models
(h_frame, w_frame, num_classes, cnn_layers, cnn_padding, h_cells, w_cells,
num_bbox, alpha, leak, checkpoint) and the ``build_graph`` closure API, plus
a functional (init_state/step/scan) API on the event model for jit/scan
composition.  Weight naming follows the checkpoint contract ``w_<name>`` /
``b_<name>`` with HWIO kernels (event_numpy.py:64).
"""

from __future__ import annotations

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from async_ev_cnn_tpu.layers.network import EventNetwork, dense_forward
from async_ev_cnn_tpu.layers.types import EventChunk
from async_ev_cnn_tpu.ops.conv import tf_same_pads
from async_ev_cnn_tpu.utils.checkpoint import load_params, normalize_names


class _YoloBase:
    def __init__(
        self,
        h_frame: int,
        w_frame: int,
        num_classes: int,
        cnn_layers: "OrderedDict[str, list[int]]",
        cnn_padding: str,
        h_cells: int,
        w_cells: int,
        num_bbox: int,
        alpha: float,
        leak: float,
        checkpoint: str | None = None,
        conv_mode: str = "dense",
        capacity_frac: float = 0.25,
        ts_window: int | None = None,
        stem_fusion: bool | str = "auto",
        window_budget_mb: float | None = None,
        activation_dtype: str = "float32",
    ):
        self._h_frame = h_frame
        self._w_frame = w_frame
        self._num_classes = num_classes
        self._cnn_layers = cnn_layers
        self._padding = cnn_padding
        self._h_cells = h_cells
        self._w_cells = w_cells
        self._num_bbox = num_bbox
        self._alpha = alpha
        self._leak = leak
        self._conv_mode = conv_mode
        self._capacity_frac = capacity_frac
        self._stem_fusion = stem_fusion
        self._activation_dtype = activation_dtype
        # clustered-stream throughput knob for the parallel-in-time path:
        # per-chunk ts maps inside a square bounding window, exact fallback
        # on overflow (ops/integrate.integrate_parallel)
        if ts_window is not None and ts_window < 1:
            raise ValueError(
                f"ts_window must be >= 1 (got {ts_window}); pass None to "
                "disable the windowed ts-map path"
            )
        self._ts_window = (ts_window, ts_window) if ts_window is not None else None
        if window_budget_mb is not None and window_budget_mb <= 0:
            raise ValueError(
                f"window_budget_mb must be > 0 (got {window_budget_mb}); "
                "pass None for the fixed default window"
            )
        self._window_budget_mb = window_budget_mb
        self._weights: dict = {}
        if checkpoint is not None:
            self.restore(checkpoint)

    @property
    def grid_shape(self):
        return (self._h_cells, self._w_cells, self._num_classes + self._num_bbox * 5)

    def restore(self, checkpoint_path: str, restrict_vars=None) -> None:
        """Load every checkpoint tensor into the weight dict
        (event_numpy.py:34-51)."""
        params = normalize_names(load_params(checkpoint_path))
        if restrict_vars is not None:
            params = {k: v for k, v in params.items() if k in restrict_vars}
        self._weights.update(params)
        self._device_cache = None

    def set_weights(self, params) -> None:
        self._weights.update(params)
        self._device_cache = None

    def _device_params(self):
        # cached: rebuilding per step()/forward() re-uploaded every
        # weight to the device inside the timed span (~30 MB/s over the
        # tunnel); restore()/set_weights() invalidate
        cache = getattr(self, "_device_cache", None)
        if cache is None:
            cache = {k: jnp.asarray(v) for k, v in self._weights.items()}
            self._device_cache = cache
        return cache

    @property
    def params(self):
        return self._weights


class YoloEventJax(_YoloBase):
    """Event-driven YOLO: a stateful async network compiled to one XLA step.

    Functional API (preferred):
        ``state = net.init_state()``
        ``state, grid = net.step(state, chunk)``        # one micro-batch
        ``state, grids = net.scan(state, chunks)``      # stacked micro-batches

    Closure API (reference parity, event_numpy.py:90-105):
        ``graph = net.build_graph(None); out = graph(events, reset)``
        where ``events`` is a host ``[N, 3]`` array of (y, x, ts) rows.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.net = EventNetwork(
            self._cnn_layers,
            self._h_frame,
            self._w_frame,
            self._leak,
            self._alpha,
            self._padding,
            conv_mode=self._conv_mode,
            capacity_frac=self._capacity_frac,
            stem_fusion=self._stem_fusion,
            activation_dtype=self._activation_dtype,
        )
        self._jit_step = jax.jit(self._step_impl)
        self._jit_scan = jax.jit(self._scan_impl)
        self._jit_scan_parallel = jax.jit(self._scan_parallel_impl)

    # ---- functional API ---------------------------------------------------

    def init_state(self):
        return self.net.init_state(self._device_params())

    def _step_impl(self, params, state, chunk):
        state, out = self.net.step(params, state, chunk)
        return state, jnp.reshape(out, self.grid_shape)

    def _scan_impl(self, params, state, chunks):
        def body(st, chunk):
            return self._step_impl(params, st, chunk)

        return jax.lax.scan(body, state, chunks)

    # cap on frames per time-batched dispatch: bounds activation memory for
    # long examples (first-layer activations at 160x224x16 are ~2.3 MB per
    # frame); the window scan pads the tail with exact no-op chunks
    PARALLEL_WINDOW = 256

    def _scan_parallel_impl(self, params, state, chunks):
        # window_budget_mb derives the window from the activation-memory
        # model (EventNetwork.auto_window); otherwise the fixed default cap
        window = None if self._window_budget_mb is not None else self.PARALLEL_WINDOW
        state, outs = self.net.scan_parallel(
            params, state, chunks, window=window,
            ts_window=self._ts_window,
            window_budget_mb=self._window_budget_mb,
        )
        return state, jnp.reshape(outs, (outs.shape[0], *self.grid_shape))

    def step(self, state, chunk: EventChunk):
        return self._jit_step(self._device_params(), state, chunk)

    # parallel-in-time pays off when many frames batch per dispatch, but
    # activation memory scales with T * H * W * C: at 512x640 the affordable
    # window is so small that the sequential full scan measured FASTER
    # (4.65 vs 5.64 ms/chunk, docs/performance.md) — route by frame size.
    PARALLEL_MAX_PIXELS = 300_000

    def scan(self, state, chunks: EventChunk):
        """Stacked micro-batches in one dispatch.  When every conv/pool layer
        runs in 'full' mode the sequential chunk recurrence reduces to the
        leaky surface, and the parallel-in-time path (scan_parallel: one
        associative scan + a time-batched forward) computes identical
        outputs several times faster — used automatically below
        ``PARALLEL_MAX_PIXELS`` (above it, per-frame activations cap the
        time window and the sequential full scan measures faster)."""
        if (
            self.net.is_all_full
            and self._h_frame * self._w_frame <= self.PARALLEL_MAX_PIXELS
        ):
            return self._jit_scan_parallel(self._device_params(), state, chunks)
        return self._jit_scan(self._device_params(), state, chunks)

    # ---- closure API (reference parity) ------------------------------------

    def build_graph(self, _=None):
        state = {"value": None, "capacity": None}

        def graph(events, reset: bool):
            events = np.asarray(events)
            n = events.shape[0]
            if reset or state["value"] is None:
                state["value"] = self.init_state()
            # pad to a stable power-of-two capacity to bound recompiles
            cap = max(16, 1 << (n - 1).bit_length())
            chunk = EventChunk.from_arrays(
                events[:, 0], events[:, 1], events[:, 2],
                p=events[:, 3] if events.shape[1] > 3 else None,
                capacity=cap,
            )
            state["value"], out = self.step(state["value"], chunk)
            return np.asarray(out)

        return graph


class YoloFrameJax(_YoloBase):
    """Dense frame YOLO as one jitted XLA program (the ``YoloFrameTf``
    analog): conv -> leaky -> maxpool chain plus optional fc tail, fed with
    an integrated frame."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        # reuse the event network's specs for an identical dense topology
        self.net = EventNetwork(
            self._cnn_layers,
            self._h_frame,
            self._w_frame,
            self._leak,
            self._alpha,
            self._padding,
        )
        self._jit_forward = jax.jit(self._forward_impl)

    def _forward_impl(self, params, frame):
        # dense_forward adds the channel axis for [H, W] itself; an
        # unconditional frame[None] double-batched channeled [C, H, W]
        # frames into an un-runnable rank-4 input
        outs = dense_forward(self.net.event_layers, params, frame, "tf")
        last = next(reversed(outs.values()))
        out = self.net.apply_tail(params, jnp.transpose(last, (1, 2, 0)))
        return jnp.reshape(out, self.grid_shape)

    def forward(self, frame):
        return self._jit_forward(self._device_params(),
                                 jnp.asarray(frame, jnp.float32))

    def build_graph(self, _=None):
        def graph(frame):
            return np.asarray(self.forward(frame))

        return graph


class YoloFrameNumpy(_YoloBase):
    """Dense pure-numpy oracle (the ``YoloFrameNumpy`` analog) — the
    framework's CPU-interpreted reference implementation and the baseline
    for the events/sec speedup measurements.

    Uses ``sliding_window_view`` + einsum rather than hand-rolled strides.
    Note: the reference re-applies the activation after each pool
    (frame_numpy.py:76-78), double-scaling negative pooled values by alpha;
    that quirk is reproduced here for drop-in parity.
    """

    def _conv(self, x, name):
        k = self._weights[f"w_{name}"]  # HWIO
        b = self._weights[f"b_{name}"]
        kh, kw, _, _ = k.shape
        if self._padding == "SAME":
            (pt, pb), (pl, pr) = tf_same_pads(x.shape[1], x.shape[2], kh, kw, 1)
            x = np.pad(x, ((0, 0), (pt, pb), (pl, pr)))
        win = np.lib.stride_tricks.sliding_window_view(x, (kh, kw), axis=(1, 2))
        # win: [C, oh, ow, kh, kw]; kernel HWIO -> einsum over C, kh, kw
        out = np.einsum("cyxhw,hwco->oyx", win, k, optimize=True) + b[:, None, None]
        return out.astype(np.float32)

    @staticmethod
    def _pool(x, ksize, stride):
        c, h, w = x.shape
        kh, kw = ksize
        oh, ow = (h - kh) // stride + 1, (w - kw) // stride + 1
        win = np.lib.stride_tricks.sliding_window_view(x, (kh, kw), axis=(1, 2))
        win = win[:, ::stride, ::stride][:, :oh, :ow]
        return win.max(axis=(-1, -2))

    def _leaky(self, x):
        return np.maximum(x, x * self._alpha)

    def forward(self, frame):
        x = np.asarray(frame, np.float32)
        x = x[None] if x.ndim == 2 else x
        flat_tail = False
        for name, size in self._cnn_layers.items():
            if "conv" in name:
                x = self._leaky(self._conv(x, name))
            elif "pool" in name:
                x = self._leaky(self._pool(x, size, size[0]))
            elif "flatten" in name:
                x = self._leaky(x.transpose(1, 2, 0).reshape(-1))
                flat_tail = True
            elif "fc" in name:
                x = self._leaky(x @ self._weights[f"w_{name}"] + self._weights[f"b_{name}"])
                flat_tail = True
        if not flat_tail:
            x = x.transpose(1, 2, 0)
        return x.reshape(self.grid_shape)

    def build_graph(self, _=None):
        return self.forward
