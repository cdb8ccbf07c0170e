"""Pallas surface-scan kernel: the leaky-surface recurrence over T chunks
in ONE HBM pass.

The parallel-in-time path needs all T chunk-boundary surfaces.  Round 2
computed them with a max-plus ``lax.associative_scan`` over per-chunk
coefficient pairs ``(b, c)`` — mathematically elegant, but expensive on
HBM: the two [T, C, H, W] coefficient arrays are materialized, the scan's
log2(T) combine levels each re-read and re-write them, and the final
``max(s0 + B, C)`` is yet another full pass (~4.3 ms of the ~6 ms
integrate stage at T=200, 160x224 — docs/performance.md).

The recurrence is elementwise per pixel:

    s[t] = max(max(s[t-1] - d[t], 0) + a[t], 0)

so the parallelism that matters on a TPU is across the 35k pixels, not
across T.  This kernel runs the *sequential* recurrence per pixel tile
with the carry held in VMEM scratch, streaming the per-chunk timestamp
map in and the surfaces out exactly once:

  * grid = (pixel_tiles, T/TB); the time axis iterates innermost with the
    running surface carried in scratch across grid steps (TPU grids run
    sequentially per core, the standard Pallas carry pattern).
  * per (tile, t): read the [8, 128] int32 ts-map block, apply the exact
    ``integrate_step`` arithmetic (same op order, same ``snap`` fences —
    bit-identical to the sequential path, gated in
    tests/test_pallas_scan.py), write the [8, 128] f32 surface block.
  * HBM traffic = read ts_map (T*P*4 B) + write surfaces (T*P*4 B); the
    coefficient arrays, scan levels, and final max pass all disappear.

The per-chunk scalars (leak decrement d[t], running last event timestamp
last_ts[t]) ride in SMEM blocks.

Reference semantics being reproduced: the two sequential clamps of
/root/reference/src/layers/integration.py:63-74 (via ops/integrate.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from async_ev_cnn_tpu.ops.integrate import TS_SENTINEL_VALUE
from async_ev_cnn_tpu.ops.numerics import SNAP_BITS

# ops.numerics.snap's constants are module-level jnp scalars, which a
# pallas kernel may not close over — same arithmetic with numpy scalars
# (identical f32 values; power-of-two scalings are exact either way)
_SNAP_UP = np.float32(2.0**SNAP_BITS)
_SNAP_DOWN = np.float32(2.0**-SNAP_BITS)


def _snap(x):
    return jnp.round(x * _SNAP_UP) * _SNAP_DOWN


LANES = 128
SUBLANES = 8
TB = 8  # chunks per grid step (time block)

TS_SENTINEL_INT = TS_SENTINEL_VALUE  # shared with ops.integrate


def _scan_kernel(ts_ref, d_ref, lt_ref, s0_ref, out_ref, s_scr, *, leak, tb):
    """One pixel tile x one time block of the recurrence.

    ts_ref: int32 [tb, 8, 128] per-chunk max event ts (sentinel = none)
    d_ref:  f32   [tb, 1] SMEM — per-chunk snapped leak decrement
    lt_ref: int32 [tb, 1] SMEM — per-chunk running last event timestamp
    s0_ref: f32   [8, 128] initial surface tile
    out_ref: f32  [tb, 8, 128] surfaces after each chunk
    s_scr:  f32   [8, 128] carry across time blocks
    """
    leak_f = np.float32(leak)
    zero = np.float32(0)

    @pl.when(pl.program_id(1) == 0)
    def _():
        s_scr[:] = s0_ref[:]

    s = s_scr[:]
    for i in range(tb):
        tm = ts_ref[i]
        d = d_ref[i, 0]
        lt = lt_ref[i, 0]
        # EXACT integrate_step arithmetic (ops/integrate.py:147-163):
        # leak-subtract, clamp, event-add, clamp — two sequential clamps,
        # every rounded product snapped.
        s1 = s - d
        s1 = jnp.where(s1 <= zero, zero, s1)
        ev = tm > TS_SENTINEL_INT
        contrib = jnp.float32(1) - _snap((lt - tm).astype(jnp.float32) * leak_f)
        s2 = s1 + jnp.where(ev, contrib, zero)
        s2 = jnp.where(s2 <= zero, zero, s2)
        out_ref[i] = s2
        s = s2
    s_scr[:] = s


def surface_scan_pallas(
    surface: jnp.ndarray,
    ts_map: jnp.ndarray,
    d: jnp.ndarray,
    last_ts: jnp.ndarray,
    leak: float,
    *,
    interpret: bool = False,
    tb: int = TB,
) -> jnp.ndarray:
    """All T chunk-boundary surfaces from the sequential recurrence.

    Args:
      surface: f32 [C, H, W] surface at the window start.
      ts_map: int32 [T, C, H, W] per-chunk per-pixel max event timestamp
        (TS_SENTINEL where the chunk has no event at that pixel).
      d: f32 [T] per-chunk snapped leak decrements.
      last_ts: int32 [T] per-chunk running last event timestamps.
      leak: leak rate per microsecond (static).

    Returns:
      f32 [T, C, H, W] surfaces after each chunk — bit-identical to
      iterating ``integrate_step``.
    """
    c, h, w = surface.shape
    t = ts_map.shape[0]
    p = c * h * w
    rows = -(-p // LANES)
    rows_pad = -(-rows // SUBLANES) * SUBLANES
    pp = rows_pad * LANES
    tp = -(-t // tb) * tb

    s0 = jnp.pad(surface.reshape(-1), (0, pp - p)).reshape(rows_pad, LANES)
    tsf = jnp.pad(
        ts_map.reshape(t, p),
        ((0, tp - t), (0, pp - p)),
        constant_values=TS_SENTINEL_INT,
    ).reshape(tp, rows_pad, LANES)
    # padded time steps are exact identities: d=0 and no events
    d2 = jnp.pad(d.astype(jnp.float32), (0, tp - t)).reshape(tp, 1)
    lt2 = jnp.pad(last_ts.astype(jnp.int32), (0, tp - t)).reshape(tp, 1)

    kernel = functools.partial(_scan_kernel, leak=float(leak), tb=tb)
    out = pl.pallas_call(
        kernel,
        grid=(rows_pad // SUBLANES, tp // tb),
        in_specs=[
            pl.BlockSpec(
                (tb, SUBLANES, LANES), lambda pi, ti: (ti, pi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((tb, 1), lambda pi, ti: (ti, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tb, 1), lambda pi, ti: (ti, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda pi, ti: (pi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tb, SUBLANES, LANES), lambda pi, ti: (ti, pi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((tp, rows_pad, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((SUBLANES, LANES), jnp.float32)],
        # time must iterate in order (the scratch carries the recurrence);
        # pixel tiles are independent
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(tsf, d2, lt2, s0)
    return out.reshape(tp, pp)[:t, :p].reshape(t, c, h, w)


# ---------------------------------------------------------------------------
# Event-scatter engine: O(E) per chunk, no ts-map in HBM.
#
# The ts-map engine above still pays the O(H*W*E) XLA compare-reduce that
# BUILDS its [T, C, H, W] int32 input, plus the ~29 MB/dispatch HBM round
# trip to materialize it (T=200 at 160x224) — measured ~1.3 ms of the
# ~8.8 ms step, the last shared cost of both round-3 integrate engines
# (docs/performance.md).  This engine reads the O(T*E) per-event lists from
# ops.integrate.chunk_event_updates instead and PLACES each chunk's <=E
# winning events onto the surface inside the kernel with a one-hot MXU
# contraction:
#
#     planes[r, c + 128*k] = sum_e onehot_row[r, e] * (onehot_col[c, e]
#                                                      * limb_k[e])
#
# Exactness without f32-matmul precision games: the placed payload is
# dt = last_ts - ts split into four 8-bit limbs, and a one-hot x
# 8-bit-integer product is exact in bf16 (integers < 256 fit bf16's 8
# significand bits); after the XLA-side dedup each output position has at
# most ONE nonzero addend, so the f32 accumulation is exact regardless of
# order.  The kernel reassembles dt in int32, converts to f32 and applies
# the bit-for-bit integrate_step arithmetic (same snap fences), so the
# engine is bit-identical to iterating integrate_step — gated in
# tests/test_pallas_scan.py.  The presence flag rides in limb 3's spare
# high bit (dt < 2^31 so limb3 <= 127; winners add 128).
#
# Cost per chunk: one [R, E] x [E, 4*128] bf16 matmul (~24 MXU tile passes
# at eFCN scale: R=288, E=256) + a few full-surface VPU passes; HBM
# traffic drops to the event lists (~16 B/event) + the surfaces the caller
# needs anyway.  Reference ethos restored: O(events) work per chunk
# (cutils.pyx:26-134), on the MXU instead of a serialized scatter.
# ---------------------------------------------------------------------------


def _scan_events_kernel(pr_ref, pc_ref, dt_ref, d_ref, s0_ref, out_ref,
                        s_scr, *, leak, rows, ep):
    """One chunk of the recurrence with in-kernel event placement.

    pr_ref/pc_ref/dt_ref: int32 [1, 1, ep] — winner row/lane/dt lists
      (row -1 = no event: its one-hot column is all-zero).  The unit
      middle axis satisfies Mosaic's block-shape rule (the last two block
      dims must divide (8, 128) or equal the array dims — a [1, ep] block
      of a [T, ep] array does neither).
    d_ref: f32 [1, 1, 1] SMEM — this chunk's snapped leak decrement
    s0_ref: f32 [rows, 128] initial surface
    out_ref: f32 [1, rows, 128] surface after this chunk
    s_scr: f32 [rows, 128] carry across chunks
    """
    leak_f = np.float32(leak)
    zero = np.float32(0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        s_scr[:] = s0_ref[:]

    pr = pr_ref[0]  # [1, ep]
    pc = pc_ref[0]
    dt = dt_ref[0]

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, ep), 0)
    lhs = (row_iota == pr).astype(jnp.bfloat16)  # [rows, ep]
    col_hit = (
        jax.lax.broadcasted_iota(jnp.int32, (LANES, ep), 0) == pc
    ).astype(jnp.bfloat16)  # [128, ep]
    l0 = (dt & 0xFF).astype(jnp.bfloat16)
    l1 = ((dt >> 8) & 0xFF).astype(jnp.bfloat16)
    l2 = ((dt >> 16) & 0xFF).astype(jnp.bfloat16)
    # presence rides in limb 3's spare bit: dt < 2^31 => limb3 <= 127
    l3 = (((dt >> 24) & 0x7F) | 128).astype(jnp.bfloat16)
    rhs_t = jnp.concatenate(
        [col_hit * l0, col_hit * l1, col_hit * l2, col_hit * l3], axis=0
    )  # [4*128, ep]
    planes = jax.lax.dot_general(
        lhs, rhs_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [rows, 4*128] — exact integers (see module comment)
    p0 = planes[:, 0 * LANES : 1 * LANES].astype(jnp.int32)
    p1 = planes[:, 1 * LANES : 2 * LANES].astype(jnp.int32)
    p2 = planes[:, 2 * LANES : 3 * LANES].astype(jnp.int32)
    p3 = planes[:, 3 * LANES : 4 * LANES].astype(jnp.int32)
    pres = p3 >= 128
    dt_px = p0 | (p1 << 8) | (p2 << 16) | ((p3 & 0x7F) << 24)

    # EXACT integrate_step arithmetic (ops/integrate.py): leak-subtract,
    # clamp, event-add, clamp — two sequential clamps, products snapped.
    s1 = s_scr[:] - d_ref[0, 0, 0]
    s1 = jnp.where(s1 <= zero, zero, s1)
    contrib = jnp.float32(1) - _snap(dt_px.astype(jnp.float32) * leak_f)
    s2 = s1 + jnp.where(pres, contrib, zero)
    s2 = jnp.where(s2 <= zero, zero, s2)
    out_ref[0] = s2
    s_scr[:] = s2


def surface_scan_events_pallas(
    surface: jnp.ndarray,
    pix_r: jnp.ndarray,
    pix_c: jnp.ndarray,
    dt: jnp.ndarray,
    d: jnp.ndarray,
    leak: float,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """All T chunk-boundary surfaces from per-event update lists.

    Args:
      surface: f32 [C, H, W] surface at the window start.
      pix_r, pix_c, dt: int32 [T, E] winner lists from
        :func:`async_ev_cnn_tpu.ops.integrate.chunk_event_updates`.
      d: f32 [T] per-chunk snapped leak decrements.
      leak: leak rate per microsecond (static).

    Returns:
      f32 [T, C, H, W] surfaces after each chunk — bit-identical to
      iterating ``integrate_step``.
    """
    c, h, w = surface.shape
    t, e = pix_r.shape
    p = c * h * w
    rows = -(-p // LANES)
    rows_pad = -(-rows // 16) * 16  # bf16 one-hot lhs wants 16-sublane tiles
    pp = rows_pad * LANES
    ep = -(-e // LANES) * LANES

    s0 = jnp.pad(surface.reshape(-1), (0, pp - p)).reshape(rows_pad, LANES)
    pr = jnp.pad(
        pix_r.astype(jnp.int32), ((0, 0), (0, ep - e)), constant_values=-1
    ).reshape(t, 1, ep)
    pc = jnp.pad(pix_c.astype(jnp.int32), ((0, 0), (0, ep - e))).reshape(t, 1, ep)
    dtp = jnp.pad(dt.astype(jnp.int32), ((0, 0), (0, ep - e))).reshape(t, 1, ep)
    d2 = d.astype(jnp.float32).reshape(t, 1, 1)

    kernel = functools.partial(
        _scan_events_kernel, leak=float(leak), rows=rows_pad, ep=ep
    )
    out = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, 1, ep), lambda ti: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ep), lambda ti: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ep), lambda ti: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda ti: (ti, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((rows_pad, LANES), lambda ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows_pad, LANES), lambda ti: (ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t, rows_pad, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows_pad, LANES), jnp.float32)],
        # the scratch carries the recurrence: time iterates in order
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(pr, pc, dtp, d2, s0)
    return out.reshape(t, pp)[:, :p].reshape(t, c, h, w)
