"""Recorded NEGATIVE: int8 quantized convs do not beat the bf16 tier at
eFCN shapes on v5e.

Hypothesis: v5e's int8 MXU peak is 2x its bf16 peak (394 TOPS vs 197
TFLOPS), so an opt-in int8-quantized serving path (per-channel weight
scales) could roughly double the conv stack on top of the bf16 headline
tier.

Measured 2026-08-17 (this script, whole eFCN conv stack time-batched at
T=200, K=8 chained dispatches with carry-dependent operands, median of
5): **bf16 5.44 ms/step vs int8 5.69 ms/step** — int8 compiles and runs
(XLA:TPU supports s8xs8->s32 `conv_general_dilated`) but is ~5% SLOWER.
Why no 2x: eFCN's contractions are shallow (Cin*kh*kw = 9..1152) and
K-tile-quantized — the MXU is occupancy-bound, not rate-bound, at these
shapes (the same K-tile analysis that bounded the f32 floor in
docs/performance.md "Round 3"), and the s32 accumulator output doubles
the write-back bytes vs bf16.  The doubled int8 issue rate only pays
off for deep contractions (Cin >= ~512 at 8-bit tiling), which eFCN
never reaches.  No quantized path ships; the bf16 matmul tier + bf16
activation storage remain the serving knobs.

Signature-isolated in one process; each leg chains K dispatches in-jit
with carry-dependent operands (no hoisting) and fetches one scalar.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import bench

bench._enable_compilation_cache()
import jax
import jax.numpy as jnp
from jax import lax

T = 200  # time batch
K = 8    # chained dispatches
REPS = 5

# eFCN conv shapes at 160x224 (NCHW batched over T): (Cin, H, W, Cout, k)
SHAPES = [
    (1, 160, 224, 16, 3),
    (16, 80, 112, 32, 3),
    (32, 40, 56, 64, 3),
    (64, 20, 28, 128, 3),
    (128, 10, 14, 256, 3),
    (256, 5, 7, 512, 1),
    (512, 5, 7, 110, 1),
]


def timeit(fn, *args):
    out = fn(*args)
    np.asarray(out)  # warm + sync
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        out = fn(*args)
        out_h = np.asarray(out)
        ts.append(time.time() - t0)
    ts = sorted(ts)
    return ts[len(ts) // 2], out_h


def make_leg(dtype, int8=False):
    rng = np.random.RandomState(0)
    xs = [jnp.asarray(rng.randn(T, c, h, w).astype(np.float32))
          for (c, h, w, o, k) in SHAPES]
    ws = [jnp.asarray(rng.randn(k, k, c, o).astype(np.float32) * 0.1)
          for (c, h, w, o, k) in SHAPES]
    if int8:
        xs = [jnp.clip(jnp.round(x * 20), -127, 127).astype(jnp.int8)
              for x in xs]
        ws = [jnp.clip(jnp.round(w * 100), -127, 127).astype(jnp.int8)
              for w in ws]

    @jax.jit
    def step(seed):
        accs = []
        s = seed
        for x, w in zip(xs, ws):
            if int8:
                xi = (x + s.astype(jnp.int8))
                out = lax.conv_general_dilated(
                    xi, w, window_strides=(1, 1), padding="SAME",
                    dimension_numbers=("NCHW", "HWIO", "NCHW"),
                    preferred_element_type=jnp.int32)
                accs.append(jnp.sum(out, dtype=jnp.int32))
            else:
                xi = x + s.astype(jnp.float32)
                out = lax.conv_general_dilated(
                    xi.astype(dtype), w.astype(dtype),
                    window_strides=(1, 1), padding="SAME",
                    dimension_numbers=("NCHW", "HWIO", "NCHW"),
                    preferred_element_type=jnp.float32)
                accs.append(jnp.sum(out, dtype=jnp.float32))
            s = s + accs[-1].astype(s.dtype) % 3
        return s

    @jax.jit
    def chained(seed):
        def body(c, _):
            return step(c), ()
        c, _ = lax.scan(body, seed, None, length=K)
        return c

    return chained


for name, kw in (("bf16", dict(dtype=jnp.bfloat16)),
                 ("int8", dict(dtype=None, int8=True))):
    try:
        leg = make_leg(**kw)
        seed = jnp.int32(1) if name == "int8" else jnp.float32(1)
        if name == "int8":
            seed = jnp.int32(1)
        dt, _ = timeit(leg, seed)
        print(json.dumps({"leg": name, "ms_per_step": round(dt / K * 1e3, 2)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"leg": name, "error": str(e)[:300]}), flush=True)
