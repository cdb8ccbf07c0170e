"""Network assembly: chain event layers from a layer-DSL dict, plus the
dense frame oracle over the same specs.

The reference builds its chain by name-matching the config's ordered layer
dict (``'conv' in name`` / ``'pool' in name``, with ``fc``/``flatten``
deferred to a dense tail — /root/reference/src/models/event_numpy.py:53-73).
We keep that contract, including the checkpoint weight-naming convention
``w_<name>`` / ``b_<name>`` with HWIO kernels (event_numpy.py:64).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from async_ev_cnn_tpu.layers.conv2d import ConvSpec, conv_init, conv_step
from async_ev_cnn_tpu.layers.integration import (
    IntegrationSpec,
    integration_init,
    integration_step,
)
from async_ev_cnn_tpu.layers.maxpool import PoolSpec, pool_init, pool_step
from async_ev_cnn_tpu.layers.types import EventChunk, LayerIO
from async_ev_cnn_tpu.ops.conv import conv2d_dense, leaky
from async_ev_cnn_tpu.ops.pool import maxpool_dense


class LayerDef(NamedTuple):
    kind: str  # 'intgr' | 'conv' | 'pool' | 'fc' | 'flatten'
    name: str
    spec: Any


def _kernel_oihw(params, name):
    """Checkpoint kernels are HWIO (TF convention, event_numpy.py:64);
    the compute wants OIHW (conv2d.py:26)."""
    return jnp.transpose(params[f"w_{name}"], (3, 2, 0, 1))


def build_layer_defs(
    layer_defs: "OrderedDict[str, list[int]]",
    frame_h: int,
    frame_w: int,
    leak: float,
    alpha: float,
    padding: str,
    conv_mode: str = "dense",
    capacity_frac: float = 0.25,
    window_frac: float = 0.25,
    activation_dtype: str = "float32",
) -> tuple[list[LayerDef], list[LayerDef]]:
    """Returns (event_layers, dense_tail) matching event_numpy.py:53-73."""
    modes = ("auto", "dense", "sparse", "sparse_pallas", "sparse_rows", "window", "full")
    if conv_mode not in modes:
        raise ValueError(f"conv_mode must be one of {modes}, got {conv_mode!r}")
    if activation_dtype not in ("float32", "bfloat16"):
        raise ValueError(
            f"activation_dtype must be 'float32' or 'bfloat16', got "
            f"{activation_dtype!r}"
        )
    # surface channel count follows the first conv's input channels:
    # 1 = polarity dropped (reference behavior), 2 = ON/OFF channels.
    first_conv_cin = next(
        (size[2] for name, size in layer_defs.items() if "conv" in name), 1
    )
    if first_conv_cin not in (1, 2):
        raise ValueError(
            f"first conv in_channels must be 1 or 2 (surface channels), "
            f"got {first_conv_cin}"
        )
    intgr = IntegrationSpec(leak=leak, h=frame_h, w=frame_w, channels=first_conv_cin)
    event_layers = [LayerDef("intgr", "intgr", intgr)]
    tail: list[LayerDef] = []
    prev_shape = intgr.out_shape
    # Once a layer runs in 'full' (recompute everything) mode, its
    # conv-actfn linearisation and active-site mask are no longer
    # maintained, so every layer downstream is coerced to 'full' too.
    force_full = False
    for name, size in layer_defs.items():
        if "conv" in name:
            kh, kw, cin, cout = size
            if cin != prev_shape[0]:
                raise ValueError(
                    f"layer {name}: in_channels {cin} != previous out_channels {prev_shape[0]}"
                )
            explicit = name in getattr(layer_defs, "modes", {})
            layer_mode = getattr(layer_defs, "modes", {}).get(name, conv_mode)
            if layer_mode not in modes:
                raise ValueError(f"layer {name}: unknown conv mode {layer_mode!r}")
            if force_full:
                if explicit and layer_mode not in ("full", "auto"):
                    raise ValueError(
                        f"layer {name}: explicit mode {layer_mode!r} cannot "
                        "follow a 'full' layer — 'full' stops maintaining "
                        "the active-site mask and conv-actfn that every "
                        "incremental mode needs (put incremental layers "
                        "before the first @full layer)"
                    )
                mode = "full"
            elif layer_mode == "auto":
                # Always 'full'.  Network-level measurements on v5e
                # (docs/performance.md): full recompute beats EVERY
                # incremental mode end-to-end in every configuration
                # tested — thin-stem nets at 512x640 (full 2.8 vs 6.9-9.1
                # ms/chunk), and even heavy 64-channel chains at full
                # resolution (full 4.65 vs rows-mix 9.9, window-mix 6.1,
                # dense 15.6), because every incremental mode carries the
                # conv-actfn second conv (2x FLOPs) plus mask/gather
                # bookkeeping, while 'full' runs ONE activation-folded
                # conv per layer and unlocks parallel-in-time batching.
                # The per-LAYER sparse wins (conv-pair vs conv-pair
                # tables) never survived composition.  A FLOPs-aware
                # look-ahead variant (rows through the last heavy conv)
                # was implemented and measured worse — see git history
                # and docs/performance.md.  The incremental modes remain
                # explicit per-layer opt-ins.
                mode = "full"
            else:
                mode = layer_mode
            force_full = force_full or mode == "full"
            spec = ConvSpec(
                in_shape=prev_shape,
                out_channels=cout,
                ksize=(kh, kw),
                stride=1,
                alpha=alpha,
                padding=padding,
                mode=mode,
                capacity_frac=capacity_frac,
                window_frac=window_frac,
                act_dtype=activation_dtype if mode == "full" else "float32",
            )
            event_layers.append(LayerDef("conv", name, spec))
            prev_shape = spec.out_shape
        elif "pool" in name:
            spec = PoolSpec(
                in_shape=prev_shape, ksize=tuple(size), stride=size[0],
                mode="full" if force_full else "event",
                act_dtype=activation_dtype if force_full else "float32",
            )
            event_layers.append(LayerDef("pool", name, spec))
            prev_shape = spec.out_shape
        elif "fc" in name:
            tail.append(LayerDef("fc", name, tuple(size)))
        elif "flatten" in name:
            tail.append(LayerDef("flatten", name, None))
        else:
            raise ValueError(f"unknown layer kind in name {name!r}")
    return event_layers, tail


def _validate_stem_fusion(stem_fusion):
    """Identity checks, not ==: 1 == True and np.True_ == True would
    pass an ``in (True, False, 'auto')`` test but then fail the
    ``is True`` dispatch in _fusion_active — silently never fusing for
    a caller who forced it on.  Reject loudly instead (shared by the
    constructor and :meth:`EventNetwork.with_stem_fusion` so the two
    entry points cannot drift to different accepted value sets)."""
    if not (stem_fusion is True or stem_fusion is False
            or stem_fusion == "auto"):
        raise ValueError(
            f"stem_fusion must be True, False or 'auto', got "
            f"{stem_fusion!r}"
        )


class EventNetwork:
    """The async event network: static specs + pure init/step over state.

    Unlike the reference's mutable layer objects (layer.py:2-30), all state
    is an explicit pytree so the whole step jits once and scans over chunks.
    """

    def __init__(
        self,
        layer_defs: "OrderedDict[str, list[int]]",
        frame_h: int,
        frame_w: int,
        leak: float,
        alpha: float = 0.1,
        padding: str = "VALID",
        conv_mode: str = "dense",
        capacity_frac: float = 0.25,
        window_frac: float = 0.25,
        stem_fusion: bool | str = "auto",
        activation_dtype: str = "float32",
    ):
        _validate_stem_fusion(stem_fusion)
        # stem_fusion composes with activation_dtype='bfloat16': the fused
        # pair accumulates in f32 and casts ONCE at the pair's (pooled)
        # output — the direct path casts conv1's full-resolution output to
        # bf16 and pools that, so fused-vs-direct differ by at most one
        # bf16 rounding at the pair boundary (the same deviation class as
        # the act-dtype knob itself; gated in tests/test_act_dtype.py).
        # An earlier guard forbade the combination while the fusion was
        # HIGHEST-only; the bf16-tier measurement that lifted that gate is
        # recorded at ops/stem.py::allow_demoted_precision.
        self.event_layers, self.dense_tail = build_layer_defs(
            layer_defs, frame_h, frame_w, leak, alpha, padding,
            conv_mode, capacity_frac, window_frac, activation_dtype,
        )
        self.alpha = alpha
        self.out_shape = self.event_layers[-1].spec.out_shape
        # conv+pool pairs the time-batched path MAY execute as one
        # space-to-depth fused op (ops/stem.py): indices into
        # event_layers[1:] of the conv whose following pool could fold in.
        # Whether a candidate pair actually fuses is decided at TRACE time
        # by :meth:`_fusion_active` from ``stem_fusion`` and the matmul
        # precision, following the measurements: at f32 HIGHEST the step
        # is compute-bound and the fusion is a wash on v5e
        # (-0.13..+0.50 ms/dispatch at T=200, round 3); at the demoted
        # bf16 matmul tier the step is HBM-bound and the fusion wins the
        # whole step 1.15x bit-exactly (stem_bf16_retest.py, 2026-08-19) —
        # but only with f32 ACTIVATION storage: under
        # activation_dtype='bfloat16' the storage cast already halves
        # conv1's round trip and the fusion measures a slight loss
        # (stem_bf16act_ab.py, same day).  Hence the default 'auto' fuses
        # exactly where it measured a win — the `default` tier x f32
        # activations — and True/False force it on (any tier, subject to
        # ops.stem.allow_demoted_precision) / off.
        from async_ev_cnn_tpu.ops.stem import s2d_pair_applicable, s2d_pair_wins

        self._stem_fusion = stem_fusion
        self._act_dtype = activation_dtype
        self._s2d_pairs = frozenset(
            i
            for i, (c, p) in enumerate(
                zip(self.event_layers[1:], self.event_layers[2:])
            )
            if c.kind == "conv" and p.kind == "pool"
            and s2d_pair_applicable(c.spec, p.spec) and s2d_pair_wins(c.spec)
        )

    def with_stem_fusion(self, stem_fusion: bool | str) -> "EventNetwork":
        """A shallow clone with a different ``stem_fusion`` policy.

        Specs, layer defs and the s2d candidate set are shared (all
        immutable); only the trace-time fusion policy differs — the
        cheap way for a consumer that knows its execution shape (e.g.
        the vmapped multi-stream serving engine) to override the
        single-stream-measured 'auto' default without rebuilding the
        network.  Candidate pairs are computed unconditionally at
        construction, so upgrading a ``stem_fusion=False`` net works.
        """
        _validate_stem_fusion(stem_fusion)
        import copy

        clone = copy.copy(self)
        clone._stem_fusion = stem_fusion
        return clone

    def _fusion_active(self) -> bool:
        """TRACE-time decision whether the candidate ``_s2d_pairs`` fuse.

        ``stem_fusion=True``: fuse at HIGHEST (historical opt-in) and at
        demoted tiers when ``ops.stem.allow_demoted_precision`` stands.
        ``'auto'`` (the default): fuse ONLY at the ``default`` (bf16)
        matmul tier with f32 activation storage — the one cell of the
        (tier x storage) matrix where the fusion measured a win (1.15x
        whole-step, HBM-bound; see ops/stem.py).  Under bf16 activation
        storage the storage cast already halves the saved round trip and
        the fusion measured a slight loss (examples/stem_bf16act_ab.py);
        at HIGHEST it is a wash (round 3); the HIGH (bf16x3) cell
        measured a wash too (6.24-6.25M fused vs 6.25-6.29M unfused
        ev/s, examples/stem_fusion_followup_ab.py 2026-08-19 — bf16x3
        triples the MXU passes, so the step is compute-bound again like
        HIGHEST), so 'auto' leaves it off there.
        Again subject to ``allow_demoted_precision``.
        Reads trace-time globals, so like ``set_matmul_precision`` it is
        not part of any jit cache key (rebuild/re-jit to apply a toggle).

        This predicate was measured on the SINGLE-stream step; consumers
        that vmap the step over streams must override via
        :meth:`with_stem_fusion` — the multi-stream serving engine does
        (the fusion regresses 28-40% under that shape, utils/serving.py).
        """
        from jax.lax import Precision

        from async_ev_cnn_tpu.ops import stem as _stem
        from async_ev_cnn_tpu.ops.conv import matmul_precision

        prec = matmul_precision()
        if self._stem_fusion is True:
            return prec is Precision.HIGHEST or _stem.allow_demoted_precision
        if self._stem_fusion == "auto":
            return (
                prec is Precision.DEFAULT
                and _stem.allow_demoted_precision
                and self._act_dtype == "float32"
            )
        return False

    # ---- memory model for the parallel-in-time path ---------------------

    def parallel_live_bytes_per_chunk(self) -> int:
        """Estimated live HBM bytes per time-batched chunk in
        :meth:`scan_parallel`.

        XLA frees each layer's activation once its consumer is done, so the
        live set at the peak is NOT the sum of all layers: it is the widest
        adjacent producer/consumer activation pair (for the eFCN that is
        conv1's [T, 16, H, W] output next to the surface input), plus the
        two surface-sized arrays of the integrate front half (the f32
        surfaces and the int32 per-chunk ts maps) that stay live across
        the network sweep.  Calibration: this model predicts ~2.7 MB/chunk
        for the eFCN at 160x224 vs ~0.9 GB measured peak at T=400
        (2.2 MB/chunk) — conservative by ~20%, which is the right side to
        err on for a budget.
        """
        from math import prod

        ispec = self.event_layers[0].spec
        surface_px = ispec.channels * ispec.h * ispec.w
        shapes = [surface_px] + [
            int(prod(ld.spec.out_shape)) for ld in self.event_layers[1:]
        ]
        peak_pair = max(a + b for a, b in zip(shapes[:-1], shapes[1:]))
        return 4 * (2 * surface_px + peak_pair)

    def auto_window(self, t: int, budget_mb: float) -> int | None:
        """Largest time window (chunks per sequential dispatch of
        :meth:`scan_parallel`) whose estimated peak activation memory fits
        ``budget_mb``, with a 2x safety factor for XLA temporaries.
        Returns ``None`` when all ``t`` chunks fit (no windowing needed).
        Replaces the round-3 folklore of hand-picking ``window``."""
        per = 2 * self.parallel_live_bytes_per_chunk()
        w = int(budget_mb * 2**20 // per)
        w = max(1, w - w % 8 if w >= 8 else w)
        return None if w >= t else w

    @property
    def is_all_full(self) -> bool:
        """True when every conv/pool layer runs in 'full' (recompute) mode —
        the precondition for the parallel-in-time execution paths."""
        return all(
            getattr(ld.spec, "mode", None) == "full"
            for ld in self.event_layers[1:]
        )

    # ---- state ----------------------------------------------------------

    def init_state(self, params) -> tuple:
        """Initial state for every layer; constructors run the dense init
        chain exactly like the reference (conv2d.py:59-61, maxpool.py:31-35)."""
        states = []
        prev_io = None
        for ld in self.event_layers:
            if ld.kind == "intgr":
                st, prev_io = integration_init(ld.spec)
            elif ld.kind == "conv":
                st, prev_io = conv_init(
                    ld.spec, _kernel_oihw(params, ld.name), params[f"b_{ld.name}"], prev_io
                )
            else:  # pool
                st, prev_io = pool_init(ld.spec, prev_io)
            states.append(st)
        return tuple(states)

    # ---- forward --------------------------------------------------------

    def forward(
        self, params, state: tuple, chunk: EventChunk, upto: int | None = None
    ) -> tuple[tuple, "OrderedDict[str, LayerIO]"]:
        """One micro-batch through every event layer; returns all taps.

        ``upto`` (static) truncates the chain after that many layers —
        the layer-level profiling harness times successive prefixes and
        differences them (utils/profiling.profile_layers).  NOTE: this
        index is INCLUSIVE over ``event_layers`` (``upto=0`` runs the
        integration layer); :meth:`full_frame_forward`'s ``upto`` is
        EXCLUSIVE over the post-integration layers — do not port one
        profiler's indices to the other."""
        states = []
        ios: "OrderedDict[str, LayerIO]" = OrderedDict()
        delta_leak = None
        prev_io = None
        for i, (ld, st) in enumerate(zip(self.event_layers, state)):
            if upto is not None and i > upto:
                states.append(st)
                continue
            if ld.kind == "intgr":
                st, prev_io, delta_leak = integration_step(ld.spec, st, chunk)
            elif ld.kind == "conv":
                st, prev_io = conv_step(
                    ld.spec,
                    _kernel_oihw(params, ld.name),
                    params[f"b_{ld.name}"],
                    st,
                    prev_io,
                    delta_leak,
                )
            else:  # pool
                st, prev_io = pool_step(ld.spec, st, prev_io, delta_leak)
            states.append(st)
            ios[ld.name] = prev_io
        return tuple(states), ios

    def apply_tail(self, params, featuremap_hwc: jnp.ndarray) -> jnp.ndarray:
        """Dense fc/flatten tail over the last event layer's [H, W, C]
        featuremap (event_numpy.py:75-88).  Empty for the shipped eFCN."""
        x = featuremap_hwc
        for ld in self.dense_tail:
            if ld.kind == "flatten":
                x = x.reshape(-1)
            else:  # fc
                x = leaky(x @ params[f"w_{ld.name}"] + params[f"b_{ld.name}"], self.alpha)
        # network outputs are f32 regardless of the inter-layer
        # activation storage dtype (act_dtype='bfloat16')
        return x.astype(jnp.float32)

    def step(self, params, state: tuple, chunk: EventChunk):
        """One micro-batch -> (new_state, output).  Output is the last event
        layer's featuremap as [H, W, C] with the dense tail applied."""
        state, ios = self.forward(params, state, chunk)
        last = next(reversed(ios.values()))
        out = self.apply_tail(params, jnp.transpose(last.featuremap, (1, 2, 0)))
        return state, out

    def scan_parallel(
        self,
        params,
        state: tuple,
        chunks: EventChunk,
        window: int | None = None,
        ts_window: tuple[int, int] | None = None,
        integrate_engine: str = "auto",
        window_budget_mb: float | None = None,
    ):
        """Parallel-in-time execution of the same streaming semantics.

        ``scan`` is a length-T dependency chain, so every chunk pays the
        whole network's per-op dispatch overhead.  In 'full' mode the only
        true recurrence is the leaky surface, and that is a max-plus affine
        map per chunk — an *associative* recurrence
        (:func:`~async_ev_cnn_tpu.ops.integrate.integrate_parallel`).  So:
        reconstruct all T chunk-boundary surfaces with one associative scan,
        then run the network **batched over T frames** (one MXU-friendly
        dispatch instead of T).  Outputs and final state match ``scan``
        (gated in tests/test_equivalence.py).

        Requires every conv/pool layer in 'full' mode (the modes with
        per-chunk state have a real step-to-step dependency and cannot be
        time-batched).  ``window`` bounds peak memory: the T axis is
        processed in sequential windows of that many chunks; alternatively
        pass ``window_budget_mb`` and the window is derived from the
        network's activation-memory model (:meth:`auto_window` — ignored
        when ``window`` is given explicitly).  ``ts_window``
        (static ``(wh, ww)``) computes each chunk's ts map inside a
        bounding box around its events — a throughput knob for spatially
        clustered streams; exact fallback if any chunk overflows (see
        :func:`~async_ev_cnn_tpu.ops.integrate.integrate_parallel`).
        ``integrate_engine`` selects the surface-reconstruction engine
        ('auto' = the Pallas scan kernel on TPU, the max-plus associative
        scan elsewhere; see integrate_parallel).
        """
        if not self.is_all_full:
            bad = [
                f"{ld.name}={getattr(ld.spec, 'mode', None)!r}"
                for ld in self.event_layers[1:]
                if getattr(ld.spec, "mode", None) != "full"
            ]
            raise ValueError(
                "scan_parallel requires conv_mode='full' for every conv/pool "
                f"layer; got {', '.join(bad)}"
            )
        from async_ev_cnn_tpu.layers.types import IntegrationState
        from async_ev_cnn_tpu.ops.integrate import integrate_parallel

        ispec = self.event_layers[0].spec
        intgr_state = state[0]

        def frame_out(frame):
            return self.full_frame_forward(params, state, frame)

        def window_body(carry, cs):
            surf, pts = carry
            surfaces, last_ts = integrate_parallel(
                surf, pts, cs, ispec.leak, ts_window=ts_window,
                engine=integrate_engine,
            )
            outs = jax.vmap(frame_out)(surfaces)
            return (surfaces[-1], last_ts[-1]), outs

        carry0 = (intgr_state.surface, intgr_state.prev_ts)
        t = chunks.y.shape[0]
        if window is None and window_budget_mb is not None:
            window = self.auto_window(t, window_budget_mb)
        if window is None or window >= t:
            carry, outs = window_body(carry0, chunks)
        else:
            pad = (-t) % window
            if pad:
                # all-invalid chunks are exact identity updates (ts falls
                # back to prev_ts, no event lands), so padding the time
                # axis to a window multiple changes nothing but shapes
                chunks = jax.tree.map(
                    lambda a: jnp.concatenate(
                        [a, jnp.zeros((pad, *a.shape[1:]), a.dtype)]
                    ),
                    chunks,
                )
            tp = t + pad
            cs = jax.tree.map(
                lambda a: a.reshape(tp // window, window, *a.shape[1:]), chunks
            )
            carry, outs = jax.lax.scan(window_body, carry0, cs)
            outs = outs.reshape(tp, *outs.shape[2:])[:t]
        new_state = (IntegrationState(carry[0], carry[1]),) + tuple(state[1:])
        return new_state, outs

    def full_frame_forward(
        self, params, state: tuple, frame: jnp.ndarray, upto: int | None = None
    ):
        """Forward one integrated surface through the all-'full' conv/pool
        chain — the time-batched leg of :meth:`scan_parallel`, also used by
        the time-sharded engine (parallel/time_shard.py).  ``frame`` is the
        f32 ``[C, H, W]`` surface; returns the YOLO-grid output.  ``upto``
        (static) truncates after that many conv/pool layers and returns the
        truncated featuremap — the parallel-path profiler's hook
        (utils/profiling.profile_layers_parallel).  NOTE: EXCLUSIVE over
        the post-integration layers (``upto=1`` runs only the first
        conv), unlike :meth:`forward`'s inclusive ``event_layers`` index
        — do not port one profiler's indices to the other."""
        from async_ev_cnn_tpu.ops.stem import fused_conv_pool

        ispec = self.event_layers[0].spec
        # surface >= 0 always, so featuremap == surface exactly and the
        # (surface > 0) activation mask is a scalar-1 no-op here.
        io = LayerIO(
            surface=frame,
            layer_actfn=jnp.ones((), jnp.float32),
            conv_actfn=jnp.zeros((), jnp.float32),
            mask=jnp.ones((ispec.h, ispec.w), bool),
        )
        layers = self.event_layers[1:]
        states = state[1:]
        i = 0
        while i < len(layers):
            if upto is not None and i >= upto:
                return io.featuremap
            ld, st = layers[i], states[i]
            if (
                i in self._s2d_pairs
                and self._fusion_active()
                and (upto is None or upto >= i + 2)
            ):
                # conv+pool executed as one space-to-depth op (ops/stem.py);
                # skipped when the profiler's `upto` cuts inside the pair.
                # Demoted-precision fusion is governed by
                # stem.allow_demoted_precision (bf16 rounding is
                # elementwise, so s2d multiplies the identical
                # bf16-rounded product set as the direct conv and only
                # f32 accumulation order differs — see ops/stem.py).
                pool_spec = layers[i + 1].spec
                fm = fused_conv_pool(
                    io.featuremap, _kernel_oihw(params, ld.name),
                    params[f"b_{ld.name}"], ld.spec.alpha,
                )
                _, oh, ow = pool_spec.out_shape
                # inter-layer activation storage (act_dtype='bfloat16'):
                # one cast at the pair's pooled output, mirroring
                # _full_pool_io — the f32 conv accumulation never hits HBM
                dt = jnp.dtype(getattr(pool_spec, "act_dtype", "float32"))
                io = LayerIO(
                    surface=fm.astype(dt),
                    layer_actfn=jnp.ones((), dt),
                    conv_actfn=jnp.zeros((), jnp.float32),
                    mask=jnp.ones((oh, ow), bool),
                )
                i += 2
                continue
            if ld.kind == "conv":
                _, io = conv_step(
                    ld.spec, _kernel_oihw(params, ld.name),
                    params[f"b_{ld.name}"], st, io, jnp.float32(0),
                )
            else:
                _, io = pool_step(ld.spec, st, io, jnp.float32(0))
            i += 1
        if upto is not None:
            return io.featuremap
        return self.apply_tail(params, jnp.transpose(io.featuremap, (1, 2, 0)))

    def scan(self, params, state: tuple, chunks: EventChunk, unroll: int = 1):
        """Scan over stacked chunks ``[T, E]``; returns (state, outputs [T, ...]).

        ``unroll`` fuses that many chunk steps per loop iteration —
        semantics are identical; it amortizes the per-iteration while-loop
        overhead (~0.5 ms on tunneled backends) over more compute.
        """

        def body(st, chunk):
            st, out = self.step(params, st, chunk)
            return st, out

        return jax.lax.scan(body, state, chunks, unroll=unroll)


def dense_forward(
    event_layers: list[LayerDef],
    params,
    frame: jnp.ndarray,
    variant: str = "tf",
    alpha: float = 0.1,
) -> "OrderedDict[str, jnp.ndarray]":
    """Dense frame oracle over the same specs; per-layer activated maps.

    ``variant='tf'`` follows frame_tf.py:86-108 (conv -> leaky -> pool).
    ``variant='numpy'`` additionally re-applies the activation after each
    pool, reproducing frame_numpy.py:76-78 — which double-applies alpha to
    negative pooled values (a reference quirk, kept behind this flag).
    Pooling is VALID to match the event path's output shapes
    (maxpool.py:27-28); frame_tf uses SAME pooling, identical whenever the
    spatial size divides the pool stride (true for the eFCN configs).
    """
    outs: "OrderedDict[str, jnp.ndarray]" = OrderedDict()
    x = frame if frame.ndim == 3 else frame[None]  # [C, H, W]
    outs["intgr"] = x
    for ld in event_layers:
        if ld.kind == "intgr":
            continue
        if ld.kind == "conv":
            spec: ConvSpec = ld.spec
            x = conv2d_dense(
                x, _kernel_oihw(params, ld.name), params[f"b_{ld.name}"],
                spec.stride, spec.padding,
            )
            x = leaky(x, spec.alpha)
        else:  # pool
            spec: PoolSpec = ld.spec
            x = maxpool_dense(x, spec.ksize, spec.stride, "VALID")
            if variant == "numpy":
                x = leaky(x, alpha)
        # mirror the event path's inter-layer activation storage dtype
        # (spec.act_dtype) so the async==dense contract stays same-program
        # under act_dtype='bfloat16' exactly as it does across matmul
        # precision tiers
        x = x.astype(jnp.dtype(getattr(spec, "act_dtype", "float32")))
        outs[ld.name] = x
    return outs
