"""Sustained-pipe follow-up to the stem-fusion default flip.

The ultra4 record (11.47M ev/s, examples/ultra4_wire_ab.py) pushed the
sustained file->device pipe off the link bound onto the device-side
W=200 dispatch structure — so the stem fusion's 1.15x device-side win
(examples/stem_bf16_retest.py, the measurement that flipped the
default) should now move the pipe record itself.  A/B: the full
library pipe (bench.bench_sustained_pipeline — on-disk N-data ->
native decode -> pack -> auto wire -> StreamingPipeline) with
stem_fusion forced off vs on, interleaved in one process.

The bf16-ACTIVATION-storage cell of the fusion matrix lives in
examples/stem_bf16act_ab.py (measured 2026-08-19: slight loss, 'auto'
leaves it unfused there).

Chip discipline per CLAUDE.md: one script, chained dispatches, compile
cache reused, interleaved reps, host fetch before reading the clock.

MEASURED 2026-08-19 ~12:40 (after a ~45 min slow-compile service
window):

* pipe_ab (ultra4, link-bound): unfused 10.74M @ 27.2 MB/s / 8.75M @
  22.2, fused 9.20M @ 23.3 / 9.63M @ 24.4 — every leg at 2.53 B/event
  x its link draw, i.e. the tunnel's weather decides and the fusion is
  invisible on the link-bound pipe.  The single-stream pipe keeps the
  library 'auto' (the fused device side only binds on co-located
  deployments, where the single-stream 1.15x applies).
* high_tier_ab (T=200 parallel-in-time, Precision.HIGH): fused
  6.25/6.24M vs unfused 6.25/6.29M ev/s (spreads 0.012-0.118) — a
  WASH: bf16x3 triples the MXU passes, so the step is compute-bound
  again like HIGHEST and the HBM saving buys nothing.  'auto' keeps
  the HIGH cell unfused; the (tier x storage) matrix is now measured
  at every cell.
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import bench

bench._enable_compilation_cache()
import numpy as np  # noqa: E402  (after cache init, matching bench)

from async_ev_cnn_tpu.ops.conv import set_matmul_precision
from async_ev_cnn_tpu.utils.config import layers_dict

# the pipe record (ultra4_wire_ab.py) was measured at the headline tier;
# without this pin the A/B would run at the library-default HIGHEST —
# the compute-bound regime where the fusion is a known wash (round 3)
set_matmul_precision(bench.HEADLINE_PRECISION)

layer_defs = layers_dict(bench.EFCN_DSL)
rng = np.random.RandomState(0)
params = bench.make_params(layer_defs, rng)

for fused in (False, True, False, True):
    eps, host_eps, mbps, nd, lat = bench.bench_sustained_pipeline(
        params, layer_defs, seconds=20, force_wire="auto",
        stem_fusion=fused)
    print(json.dumps({"probe": "pipe_ab", "fused": fused,
                      "events_per_sec": round(eps, 1),
                      "host_events_per_sec": round(host_eps, 1),
                      "wire_mbps": round(mbps, 2),
                      "B_per_event": round(mbps * 1e6 / eps, 2)
                      if eps else None,
                      "dispatches": nd}), flush=True)

# ---- the Precision.HIGH (bf16x3) cell of the fusion matrix ---------------
# 'auto' currently fuses only at `default` (the measured cell); this leg
# decides whether HIGH joins it.  Whole-step parallel-in-time A/B, same
# protocol as stem_bf16_retest.py.
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from async_ev_cnn_tpu.layers.network import EventNetwork  # noqa: E402

set_matmul_precision("high")
jparams = {k: jnp.asarray(v) for k, v in params.items()}
events = bench.synth_stream(rng, bench.DISPATCHES * bench.T_PARALLEL,
                            bench.CAPACITY)
chunks, n_events = bench._pack_k(events, bench.CAPACITY)
for fused in (False, True, False, True):
    net = EventNetwork(layer_defs, bench.H, bench.W, leak=bench.LEAK,
                       alpha=0.1, padding="SAME", conv_mode="full",
                       stem_fusion=fused)
    state = net.init_state(jparams)
    fn = jax.jit(lambda s, c, n=net: n.scan_parallel(jparams, s, c))
    eps, dt, spread = bench._chained_events_per_sec(fn, state, chunks,
                                                    n_events)
    print(json.dumps({"probe": "high_tier_ab", "fused": fused,
                      "events_per_sec": round(eps, 1),
                      "ms_per_dispatch": round(dt / bench.DISPATCHES * 1e3, 2),
                      "spread": round(spread, 3)}), flush=True)
