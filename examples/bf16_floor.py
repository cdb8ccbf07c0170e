"""bf16-tier floor analysis: how close is the headline path to
speed-of-light at the bf16 matmul tier?

Two parts (one process, signature-isolated legs, shared compile cache):

1. the analytic MXU floor: per conv layer, FLOPs / (bf16 peak * K_util
   * N_util) with tile utilizations K/(128*ceil(K/128)) — the round-3
   f32 model (docs/performance.md "Conv-stack floor analysis") extended
   with the output-channel (N) tile term and evaluated at the 197
   TFLOP/s v5e bf16 peak;
2. measured K=32 RTT-amortized dispatches (RTT share ~0.9 ms) at T=200
   for both activation dtypes.

Measured 2026-08-17:

* floor_calc: MXU floor **2.2 ms/dispatch**, of which **1.19 ms is
  conv1** under the naive tile model (K=9 -> 7% K-util x 12% N-util) —
  pessimistic, since XLA lowers Cin=1 stem convs through specialized
  emitters; ex-conv1 the floor is ~1.0 ms.
* k32 f32-act: 11.6M ev/s, 4.41 ms/dispatch (~3.5 ms ex-RTT).
* k32 bf16-act: **17.77M ev/s, 2.88 ms/dispatch (~2.0 ms ex-RTT)** —
  ~25M ev/s device rate, BELOW the naive 2.2 ms floor and within ~2x of
  the ex-conv1 floor: with bf16 activations the step is no longer
  MXU-bound; what remains is the inherent per-frame HBM traffic
  (surfaces, pool reads) and the event machinery.  The conv chapter is
  closed at this tier too.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import bench

bench._enable_compilation_cache()

# ---- analytic floor (host only) ----------------------------------------
T = 200
SHAPES = [  # (name, Cin, H, W, Cout, k)
    ("conv1", 1, 160, 224, 16, 3),
    ("conv2", 16, 80, 112, 32, 3),
    ("conv3", 32, 40, 56, 64, 3),
    ("conv4", 64, 20, 28, 128, 3),
    ("conv5", 128, 10, 14, 256, 3),
    ("conv6", 256, 5, 7, 512, 1),
    ("conv7", 512, 5, 7, 110, 1),
]
PEAK_BF16 = 197e12  # v5e
rows = []
total = 0.0
for name, ci, h, w, co, k in SHAPES:
    kk = ci * k * k
    k_util = kk / (128 * -(-kk // 128))
    n_util = co / (128 * -(-co // 128))
    flops = 2 * kk * co * h * w * T
    ms = flops / (PEAK_BF16 * k_util * max(n_util, 1e-9)) * 1e3
    rows.append((name, kk, round(k_util, 2), round(n_util, 2),
                 round(flops / 1e9, 2), round(ms, 3)))
    total += ms
print(json.dumps({"probe": "floor_calc", "rows": rows,
                  "mxu_floor_ms": round(total, 2)}), flush=True)

# ---- measured K=32 legs -------------------------------------------------
from async_ev_cnn_tpu.ops.conv import set_matmul_precision
from async_ev_cnn_tpu.utils.config import layers_dict

layer_defs = layers_dict(bench.EFCN_DSL)
rng = np.random.RandomState(0)
params = bench.make_params(layer_defs, rng)
set_matmul_precision(bench.HEADLINE_PRECISION)
events_k32 = bench.synth_stream(rng, 32 * bench.T_PARALLEL, bench.CAPACITY)

for act in ("float32", "bfloat16"):
    eps, dt, spread = bench.bench_tpu_parallel(
        params, layer_defs, events_k32, dispatches=32,
        activation_dtype=act)
    print(json.dumps({
        "probe": "k32", "activation_dtype": act,
        "events_per_sec": round(eps, 1),
        "ms_per_dispatch": round(dt / 32 * 1e3, 3),
        "spread": round(spread, 3)}), flush=True)
