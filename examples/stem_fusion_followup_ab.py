"""Follow-ups to the stem-fusion default flip (examples/stem_bf16_retest.py):

1. bf16-ACTIVATION-storage leg: fused vs unfused whole-step A/B at the
   `default` matmul tier, plus the fused-vs-unfused deviation (the pair
   casts once at the pooled output instead of casting conv1's full-res
   output and pooling that, so outputs differ by one bf16 rounding at
   the pair boundary — CPU-gated at 2e-2 relative in test_act_dtype).
   Decides whether bench's bf16-act leg and the serving knob opt in.

2. Sustained file->device pipe at the ultra4 wire tier: fused vs
   unfused.  The ultra4 record (11.47M ev/s, examples/ultra4_wire_ab.py)
   pushed the pipe off the link bound onto the device-side W=200
   dispatch structure — a 1.15x device-side win should now move the
   pipe record itself.

Chip discipline per CLAUDE.md: one script, chained dispatches, compile
cache reused, interleaved reps, host fetch before reading the clock.

STATUS: see the JSON lines appended below / docs/performance.md
"Round 5" once measured.
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
from async_ev_cnn_tpu.ops.conv import set_matmul_precision
from async_ev_cnn_tpu.utils.config import layers_dict

layer_defs = layers_dict(bench.EFCN_DSL)
rng = np.random.RandomState(0)
params = bench.make_params(layer_defs, rng)
jparams = {k: jnp.asarray(v) for k, v in params.items()}
set_matmul_precision(bench.HEADLINE_PRECISION)

events = bench.synth_stream(rng, bench.DISPATCHES * bench.T_PARALLEL,
                            bench.CAPACITY)
chunks, n_events = bench._pack_k(events, bench.CAPACITY)


def net_for(fused):
    return EventNetwork(layer_defs, bench.H, bench.W, leak=bench.LEAK,
                        alpha=0.1, padding="SAME", conv_mode="full",
                        stem_fusion=fused, activation_dtype="bfloat16")


# ---- 1a. fused-vs-unfused deviation on chip (40 chunks) ------------------
one = jax.tree.map(lambda a: a[0][:40], chunks)
outs = {}
for fused in (False, True):
    net = net_for(fused)
    st0 = net.init_state(jparams)
    _, o = jax.jit(lambda s, c, n=net: n.scan_parallel(jparams, s, c))(st0,
                                                                       one)
    outs[fused] = np.asarray(o)
scale = float(np.abs(outs[False]).max())
d = float(np.abs(outs[True] - outs[False]).max())
print(json.dumps({"probe": "bf16_act_fused_vs_unfused_dev",
                  "max_abs_diff": d, "scale": round(scale, 4),
                  "rel": round(d / max(scale, 1e-9), 5)}), flush=True)

# ---- 1b. whole-step A/B ---------------------------------------------------
for fused in (False, True, False, True):
    net = net_for(fused)
    state = net.init_state(jparams)
    fn = jax.jit(lambda s, c, n=net: n.scan_parallel(jparams, s, c))
    eps, dt, spread = bench._chained_events_per_sec(fn, state, chunks,
                                                    n_events)
    print(json.dumps({"probe": "bf16_act_ab", "fused": fused,
                      "events_per_sec": round(eps, 1),
                      "ms_per_dispatch": round(dt / bench.DISPATCHES * 1e3, 2),
                      "spread": round(spread, 3)}), flush=True)

# ---- 2. sustained ultra4 pipe, fused vs unfused ---------------------------
for fused in (False, True, False, True):
    eps, host_eps, mbps, nd, lat = bench.bench_sustained_pipeline(
        params, layer_defs, seconds=20, force_wire="auto",
        stem_fusion=fused)
    print(json.dumps({"probe": "pipe_ab", "fused": fused,
                      "events_per_sec": round(eps, 1),
                      "host_events_per_sec": round(host_eps, 1),
                      "wire_mbps": round(mbps, 2),
                      "dispatches": nd}), flush=True)
