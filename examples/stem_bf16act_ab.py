"""Stem fusion x bf16 ACTIVATION storage — the pending on-chip A/B.

The round-5 stem re-test (examples/stem_bf16_retest.py) flipped the s2d
conv1+pool1 fusion default-on at demoted matmul tiers for the
f32-activation legs (bit-exact, 1.15x whole-step).  The bf16
activation-STORAGE leg (``activation_dtype='bfloat16'``, the serving
knob) was left unfused pending its own A/B: its published one-bf16-ulp
deviation bound was measured on the direct path, and the fused pair
changes where the inter-layer cast lands (once at the pooled output
instead of at conv1's full-resolution output).

Two probes, same protocol as the stem re-test:

1. parity: fused vs unfused scan_parallel with
   ``activation_dtype='bfloat16'`` at the headline (`default`) matmul
   tier over 40 chunks.  Expected near-zero: the cast is monotone and
   max-pool commutes with monotone rounding, so the pooled bf16 values
   can only differ where the f32 pre-cast values straddle a bf16
   rounding boundary differently after the (exact) s2d permutation —
   i.e. by at most one bf16 ulp, the knob's existing deviation bound.
2. whole-step interleaved A/B: fused vs unfused, T=200, K=8 chained,
   two reps each.

The f32-act fusion win came from deleting conv1's full-res f32
activation round trip (~459 MB/dispatch at T=200).  Under bf16 storage
that term is already halved, so the expected win is smaller — this A/B
decides whether bench's bf16-act legs flip to fused.

STATUS: MEASURED on the v5e chip 2026-08-19.  Parity (fused vs
unfused, bf16 act, `default` tier, 40 chunks): max_abs_diff **0.0** —
the monotone-cast argument holds exactly, so the knob's one-ulp
deviation bound is unchanged by fusion.  Whole-step interleaved A/B
(T=200, K=8 chained, two reps each):

    fused=False  9.50M / 9.39M ev/s   (spread 0.097 / 0.101)
    fused=True   9.27M / 9.27M ev/s   (spread 0.048 / 0.117)

-> under bf16 ACTIVATION storage the fusion is a slight LOSS (~1.5%,
inside the rep spread): the direct path's conv1 round trip is already
halved by the storage cast, and the remaining saving no longer pays
for the s2d reshuffle.  Exactly the HBM-term arithmetic predicts —
the f32-act win came from deleting a full-f32-resolution round trip.
Consequence: bench._net's policy STANDS (bf16-act legs unfused,
f32-act legs fused at demoted tiers), now measurement-backed on both
sides; recorded in docs/performance.md "Stem fusion at the bf16 tier".
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


def make_net(fused):
    net = EventNetwork(layer_defs, bench.H, bench.W, leak=bench.LEAK,
                       alpha=0.1, padding="SAME", conv_mode="full",
                       stem_fusion=fused, activation_dtype="bfloat16")
    if fused:
        assert net._s2d_pairs and net._fusion_active(), "stem pair must fuse"
    return net


# ---- 1. parity: fused vs unfused under bf16 activation storage ----------
one = jax.tree.map(lambda a: a[0][:40], chunks)  # 40 chunks
outs = {}
for fused in (False, True):
    net = make_net(fused)
    st0 = net.init_state(jparams)
    _, o = jax.jit(lambda s, c, n=net: n.scan_parallel(jparams, s, c))(st0,
                                                                       one)
    outs[fused] = np.asarray(o, dtype=np.float32)
d = float(np.max(np.abs(outs[True] - outs[False])))
print(json.dumps({"probe": "parity_bf16act_fused_vs_unfused",
                  "max_abs_diff": d}), flush=True)

# ---- 2. whole-step A/B ----------------------------------------------------
for fused in (False, True, False, True):
    net = make_net(fused)
    state = net.init_state(jparams)
    fn = jax.jit(lambda s, c, n=net: n.scan_parallel(jparams, s, c))
    eps, dt, spread = bench._chained_events_per_sec(fn, state, chunks,
                                                    n_events)
    print(json.dumps({"probe": "ab", "fused": fused,
                      "events_per_sec": round(eps, 1),
                      "ms_per_dispatch": round(dt / bench.DISPATCHES * 1e3, 2),
                      "spread": round(spread, 3)}), flush=True)
