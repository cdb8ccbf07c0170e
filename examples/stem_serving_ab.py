"""Stem fusion x vmapped multi-stream serving — the cell the default
flip did NOT measure.

The 2026-08-19 builder bench capture (stem_fusion='auto' live) put the
f32-act serving sweep 30-40% BELOW every earlier capture's band
(S=8/16/32/64: 6.53/7.53/8.30/7.74M vs 9.06/10.84/12.05/12.81M) while
the bf16-act serving rows — which 'auto' leaves unfused — matched the
earlier captures exactly (19.55M at S=128 vs 19.52-19.58M).  A healthy
chip plus a regression confined to exactly the rows the flip changed
points at the fusion under ``jax.vmap`` (the serving legs' shape),
which stem_bf16_retest.py never measured: it A/B'd the single-stream
parallel-in-time step only.

Plausible mechanism (to be confirmed/refuted by the measurement): the
s2d stem reshapes [T, 1, H, W] -> [T, 4, H/2, W/2] with static
reshape/transpose XLA folds into the conv's layout assignment; under
vmap the leading stream dim turns those into batched transposes that
XLA materializes through HBM per stream, and at S*T lanes the extra
pass outweighs the fused stem's HBM saving.

A/B: bench_tpu_serving (the exact bench leg) at S=32, default tier,
f32 activations, fused vs unfused interleaved twice in one process.
Chip discipline per CLAUDE.md: chained dispatches, compile cache,
host fetch before reading the clock.

MEASURED 2026-08-19 ~13:15 — CONFIRMED, decisively:

* unfused 11.72M / 11.78M ev/s, 34.9/34.8 ms per 50-chunk dispatch
  (spreads 0.023/0.018)
* fused    8.33M /  8.34M ev/s, 49.2/49.1 ms (spreads 0.014/0.014)

A 1.41x regression, interleaved, agreeing with the capture's
cross-run numbers on both sides (fused 8.30M / unfused 12.05M at
S=32).  The serving engine's streams>1 override of 'auto'
(utils/serving.py) and bench_tpu_serving's unfused default are
therefore measurement-backed.  Consistent with the HBM story: vmap
batches the s2d reshape/transpose into per-stream relayouts XLA
materializes through HBM, and at S x T lanes that extra pass costs
more than the fused stem saves.
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import bench

bench._enable_compilation_cache()
import numpy as np  # noqa: E402  (after cache init, matching bench)

from async_ev_cnn_tpu.ops.conv import set_matmul_precision
from async_ev_cnn_tpu.utils.config import layers_dict

set_matmul_precision(bench.HEADLINE_PRECISION)

layer_defs = layers_dict(bench.EFCN_DSL)
rng = np.random.RandomState(0)
params = bench.make_params(layer_defs, rng)
# the serving legs dispatch T_CHUNKS=50-chunk windows (bench.py:714 —
# the T_PARALLEL=200 shape at S=32 overflows HBM, measured
# RESOURCE_EXHAUSTED both fused and unfused)
events = bench.synth_stream(rng, bench.DISPATCHES * bench.T_CHUNKS,
                            bench.CAPACITY)

for fused in (False, True, False, True):
    eps, lat, spread = bench.bench_tpu_serving(
        params, layer_defs, events, n_streams=32, stem_fusion=fused)
    print(json.dumps({"probe": "serving_ab", "streams": 32,
                      "fused": fused, "events_per_sec": round(eps, 1),
                      "latency_ms_per_dispatch": round(lat * 1e3, 3),
                      "spread": round(spread, 3)}), flush=True)
