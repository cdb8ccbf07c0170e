"""Floor experiment: can ANY incremental conv update beat 'full' at VGA+?

Round 2 quantified an HWC128-resident redesign of the sparse/rows modes
(zero marshal, row scatters, kernel-direct commits) as "~3-3.5x headroom
vs dense-masked" and left it untaken (docs/performance.md).  This script
settles whether that redesign could ever beat the measured end-to-end
winner, full recompute, by timing on the chip:

  A) the competitor: one full-mode conv_step at 512x640, C=O=64
     (one activation-folded conv of the predecessor featuremap — no
     state, no masks, no second conv);

  B) a STRICT LOWER BOUND on any incremental update in any layout — the
     per-chunk state passes every reference-semantics incremental mode
     must pay even with a free gather/GEMM:
       1. leak propagation  fm_leaked = fm - snap(cact * delta_leak)
          (reads both state planes, writes one: conv2d.py:113-115 in the
          reference, layers/conv2d.py here);
       2. sign-change event extraction  any(before != after, channel)
          (conv2d.py:124-131);
       3. committing R active rows of (given, precomputed) fm/cact values
          into the HWC state planes.
     No conv, no gather, no rulebook build — (B) does zero useful math.

If B >= A on the hardware, the HWC-resident redesign is dead on arrival:
the incremental modes' mandatory state traffic alone costs more than
recomputing everything, and their only remaining role is
reference-semantics execution + far-larger-than-VGA regimes.

Run on the TPU:  python examples/hwc_floor.py

Measured 2026-08-17 on v5e (one chip draw, median of 3, ~1.45 ms RTT
share included in both; K=20 chained steps per dispatch):
    A  full-mode conv_step          : 6.28 ms
    B  incremental state floor      : 3.93 ms  (0.62x of A)
Verdict (docs/performance.md "Round-3 verdict"): even with a FREE gather
the heavy-layer budget left over is ~2.3 ms — the realized rows costs
put an idealized HWC-resident update at best ~1.2-1.45x vs full, inside
draw variance; for thin layers the floor alone exceeds the full conv.
The HWC-resident redesign is closed out as not-worth-it on this
hardware.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from async_ev_cnn_tpu.layers.conv2d import ConvSpec, conv_step
from async_ev_cnn_tpu.layers.types import ConvState, LayerIO
from async_ev_cnn_tpu.ops.numerics import snap

H, W, C, O = 512, 640, 64, 64
C128 = 128  # idealized HWC-resident channel padding
R = 72      # active rows per chunk (clustered 1024 sites, round-2 geometry)
K_STEPS = 20
REPS = 3


def timeit(fn, *args):
    # fns return SCALARS: fetching a big array over the ~30 MB/s tunnel
    # would dominate the measurement (the round-3 first cut of this very
    # script fetched the full planes and reported pure fetch time)
    float(fn(*args))  # compile + sync
    times = []
    for _ in range(REPS):
        t0 = time.time()
        float(fn(*args))
        times.append(time.time() - t0)
    return float(np.median(times)) / K_STEPS * 1e3  # ms per step


def bench_full_conv(rng):
    spec = ConvSpec(in_shape=(C, H, W), out_channels=O, ksize=(3, 3),
                    stride=1, alpha=0.1, padding="SAME", mode="full")
    kernel = jnp.asarray(rng.randn(O, C, 3, 3).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.randn(O).astype(np.float32) * 0.05)
    state = ConvState(jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
    x0 = jnp.asarray(rng.rand(C, H, W).astype(np.float32))

    @jax.jit
    def chained(x):
        def body(carry, _):
            io = LayerIO(surface=carry, layer_actfn=jnp.ones((), jnp.float32),
                         conv_actfn=jnp.zeros((), jnp.float32),
                         mask=jnp.ones((H, W), bool))
            _, out = conv_step(spec, kernel, bias, state, io, jnp.float32(0))
            # feed forward on-device: next input depends on this output,
            # so no step can be hoisted or dead-code-eliminated
            nxt = carry + jnp.mean(out.surface)
            return nxt, ()
        final, _ = jax.lax.scan(body, x, None, length=K_STEPS)
        return jnp.mean(final)

    return timeit(chained, x0)


def bench_incremental_floor(rng):
    """The mandatory state passes of ANY incremental update, idealized
    HWC128-resident layout, zero gather/GEMM cost."""
    fm0 = jnp.asarray(rng.rand(H, W, C128).astype(np.float32))
    ca0 = jnp.asarray(rng.rand(H, W, C128).astype(np.float32) * 0.1)
    rows_vals_fm = jnp.asarray(rng.rand(R, W, C128).astype(np.float32))
    rows_vals_ca = jnp.asarray(rng.rand(R, W, C128).astype(np.float32) * 0.1)
    row_idx0 = jnp.asarray(
        np.sort(rng.choice(H - 1, R, replace=False)).astype(np.int32))

    @jax.jit
    def chained(fm, ca, row_idx):
        def body(carry, _):
            fm, ca, rows = carry
            dl = jnp.float32(0.015625)  # snapped per-chunk leak
            before_pos = fm >= 0
            fm_leaked = fm - snap(ca * dl)                       # pass 1
            # commit R rows of precomputed values (the free-gather ideal)
            fm2 = fm_leaked.at[rows].set(rows_vals_fm)           # pass 3a
            ca2 = ca.at[rows].set(rows_vals_ca)                  # pass 3b
            changed = jnp.any(before_pos != (fm2 >= 0), axis=-1)  # pass 2
            # keep everything live + carry-dependent
            rows2 = (rows + jnp.int32(1)) % jnp.int32(H - 1)
            fm2 = fm2 + jnp.float32(1e-7) * jnp.sum(changed)
            return (fm2, ca2, rows2), ()
        (fm, ca, _), _ = jax.lax.scan(
            body, (fm, ca, row_idx), None, length=K_STEPS)
        return jnp.mean(fm) + jnp.mean(ca)

    return timeit(chained, fm0, ca0, row_idx0)


def main():
    rng = np.random.RandomState(0)
    a = bench_full_conv(rng)
    b = bench_incremental_floor(rng)
    print(json.dumps({
        "full_conv_step_ms": round(a, 3),
        "incremental_state_floor_ms": round(b, 3),
        "floor_vs_full": round(b / a, 2),
        "geometry": f"{H}x{W}, C={C}->O={O} (floor uses HWC C128), R={R} rows",
        "note": "floor does ZERO conv/gather work; if floor_vs_full >= 1 "
                "the HWC-resident incremental redesign cannot win here",
    }))


if __name__ == "__main__":
    main()
