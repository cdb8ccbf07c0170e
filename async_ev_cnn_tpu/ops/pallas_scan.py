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
