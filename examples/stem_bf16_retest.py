"""Stem-fusion re-test at the bf16 headline tier — the measurement that
governs ``ops.stem.allow_demoted_precision``'s default.

Round 3 measured the s2d conv1+pool1 fusion a wash at f32 HIGHEST, where
the step was compute-bound.  The round-4 floor analysis
(examples/bf16_floor.py) shows the bf16-tier step is HBM-bound — and the
fusion's main saving is exactly the largest HBM term (conv1's
full-resolution [T, 16, H, W] output, ~459 MB/dispatch written + read at
T=200 f32).  Re-test:

1. parity: scan (direct convs) vs scan_parallel (s2d-fused) at
   `default` precision — gate tolerance 1e-4, report the actual max
   (expected ~1e-7: bf16 rounding is elementwise and s2d only permutes
   the operands, so the product set is identical and only f32
   accumulation order differs).
2. whole-step A/B: fused vs unfused scan_parallel at `default`,
   interleaved same-process reps.

STATUS: MEASURED on the v5e chip 2026-08-19.  Parity at the `default`
tier: max_abs_diff **0.0** over the 40-chunk scan-vs-scan_parallel gate
(the elementwise-rounding argument holds exactly, not just to 1e-7).
Whole-step interleaved A/B (T=200, K=8 chained, two reps each):

    fused=False  7.14M / 7.11M ev/s   (spread 0.013 / 0.008)
    fused=True   8.27M / 8.16M ev/s   (spread 0.031 / 0.013)

-> the fusion wins the whole parallel-in-time step **1.15x** at the
bf16 matmul tier, where the step is HBM-bound and the pair's saved
full-resolution conv1 activation round trip is the largest HBM term
(examples/bf16_floor.py) — unlike f32 HIGHEST, where the step is
compute-bound and the same fusion measured a wash (round 3).
``ops.stem.allow_demoted_precision`` defaults True per this run and
bench's nets use the library's ``stem_fusion='auto'``, whose
trace-time predicate fuses exactly at this measured cell (`default`
tier x f32 activation storage — EventNetwork._fusion_active); recorded
in docs/performance.md "Round 5".
"""
import json
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

import bench

bench._enable_compilation_cache()
import jax
import jax.numpy as jnp

from async_ev_cnn_tpu.layers.network import EventNetwork
from async_ev_cnn_tpu.ops import stem
from async_ev_cnn_tpu.ops.conv import set_matmul_precision
from async_ev_cnn_tpu.utils.config import layers_dict

stem.allow_demoted_precision = True

layer_defs = layers_dict(bench.EFCN_DSL)
rng = np.random.RandomState(0)
params = bench.make_params(layer_defs, rng)
jparams = {k: jnp.asarray(v) for k, v in params.items()}
set_matmul_precision(bench.HEADLINE_PRECISION)

events = bench.synth_stream(rng, bench.DISPATCHES * bench.T_PARALLEL,
                            bench.CAPACITY)
chunks, n_events = bench._pack_k(events, bench.CAPACITY)

# ---- 1. parity at default tier -----------------------------------------
net_f = EventNetwork(layer_defs, bench.H, bench.W, leak=bench.LEAK,
                     alpha=0.1, padding="SAME", conv_mode="full",
                     stem_fusion=True)
assert net_f._s2d_pairs, "stem pair must fuse"
one = jax.tree.map(lambda a: a[0][:40], chunks)  # 40 chunks
st0 = net_f.init_state(jparams)
_, outs_seq = jax.jit(lambda s, c: net_f.scan(jparams, s, c))(st0, one)
_, outs_par = jax.jit(
    lambda s, c: net_f.scan_parallel(jparams, s, c))(st0, one)
d = float(jnp.max(jnp.abs(outs_seq - outs_par)))
print(json.dumps({"probe": "parity_default_tier", "max_abs_diff": d,
                  "gate": 1e-4, "ok": d <= 1e-4}), flush=True)

# ---- 2. whole-step A/B --------------------------------------------------
for fused in (False, True, False, True):
    net = EventNetwork(layer_defs, bench.H, bench.W, leak=bench.LEAK,
                       alpha=0.1, padding="SAME", conv_mode="full",
                       stem_fusion=fused)
    state = net.init_state(jparams)
    fn = jax.jit(lambda s, c, n=net: n.scan_parallel(jparams, s, c))
    eps, dt, spread = bench._chained_events_per_sec(fn, state, chunks,
                                                    n_events)
    print(json.dumps({"probe": "ab", "fused": fused,
                      "events_per_sec": round(eps, 1),
                      "ms_per_dispatch": round(dt / bench.DISPATCHES * 1e3, 2),
                      "spread": round(spread, 3)}), flush=True)
