"""K-tile floor experiment (round-4 verdict #3): can reformulating the
eFCN stem conv as an im2col GEMM with a packed contraction beat the XLA
conv emitter?

Background: at the claimed headline rate the chip runs at ~5% of bf16
MXU peak, and docs/performance.md's floor analysis blames the tiny
contraction dims — conv1 contracts K = Cin*kh*kw = 9 against a 128-wide
MXU K tile (93% of each pass idle).  The verdict asked for ONE
in-process A/B: im2col-pack the stem GEMM (or batch streams into the
contraction) and measure whole-step medians, or record the negative
with data.

Structural analysis the legs test:
  * K is the REDUCTION dim — independent outputs cannot merge into it
    without block-diagonal zero blocks, which the MXU multiplies anyway
    (no useful-FLOP gain).  Space-to-depth (ops/stem.py) re-blocks K
    9*Cin -> 36*Cin, but the nonzero taps per output column stay 9*Cin:
    the extra K entries are structural zeros, so MXU *useful* utilization
    is unchanged — its measured win came from HBM traffic (no full-res
    conv1 output), not the K tile.
  * Therefore an explicit im2col GEMM (K=9) and the same GEMM zero-padded
    to K=128 should run at the SAME speed as the conv emitter if the
    emitter already K-pads (the hypothesis this script falsifies or
    confirms), and none of them can exceed the 9/128 useful-K ceiling.

Legs (whole eFCN conv stack, T=200 time-batched, K=8 chained dispatches
with carry-dependent operands, one scalar fetch, median of 5, both
matmul tiers):
  conv         — lax.conv_general_dilated for every layer (baseline)
  im2col       — conv1 as patches -> [M, 9] x [9, 16] dot
  im2col_k128  — same GEMM, K zero-padded to 128 (explicit full tile)
  s2d          — conv1+pool1 fused via space-to-depth (ops/stem.py)

STATUS / measured result (2026-08-18, v5e via tunnel, cold cache):

    {"leg": "conv",        "tier": "bf16",        "ms_per_step": 4.96}
    {"leg": "im2col",      "tier": "bf16",        "ms_per_step": 8.514}
    {"leg": "im2col_k128", "tier": "bf16",        "ms_per_step": 18.001}
    {"leg": "s2d",         "tier": "bf16",        "ms_per_step": 4.71}
    {"leg": "conv",        "tier": "f32_highest", "ms_per_step": 9.646}
    {"leg": "im2col",      "tier": "f32_highest", "ms_per_step": 14.179}
    {"leg": "im2col_k128", "tier": "f32_highest", "ms_per_step": 39.005}
    {"leg": "s2d",         "tier": "f32_highest", "ms_per_step": 9.454}

Structural expectation CONFIRMED: zero-padding K to a full tile is
~3.6-4x slower (the pad materializes 14x the patch bytes through HBM
for zero useful FLOPs), plain im2col loses ~1.5-1.7x (it materializes
the patch matrix the conv emitter reads implicitly), and only the
HBM-reducing s2d leg edges the baseline (~2-5%, within its previously
measured whole-step band; remains the `stem_fusion=True` opt-in).
docs/performance.md "K-tile floor A/B" records the conclusion.
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

from async_ev_cnn_tpu.ops.stem import build_s2d_kernel, space_to_depth

T = 200
K = 8
REPS = 5
H, W = 160, 224
ALPHA = 0.1

# eFCN conv chain (Cin, Cout, k) with a 2x2/2 pool after the 3x3 convs
CHAIN = [
    (1, 16, 3, True),
    (16, 32, 3, True),
    (32, 64, 3, True),
    (64, 128, 3, True),
    (128, 256, 3, True),
    (256, 512, 1, False),
    (512, 110, 1, False),
]


def leaky(x):
    return jnp.where(x > 0, x, ALPHA * x)


def pool2(x):
    t, c, h, w = x.shape
    return x.reshape(t, c, h // 2, 2, w // 2, 2).max(axis=(3, 5))


def timeit(fn, *args):
    np.asarray(fn(*args))  # compile + sync
    np.asarray(fn(*args))  # steady clocks
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        out = np.asarray(fn(*args))
        ts.append(time.time() - t0)
    ts = sorted(ts)
    return ts[len(ts) // 2]


def make_leg(stem, precision, dtype):
    rng = np.random.RandomState(0)
    ws = [jnp.asarray(rng.randn(k, k, ci, co).astype(np.float32) * 0.1)
          for ci, co, k, _ in CHAIN]
    bs = [jnp.asarray(rng.randn(co).astype(np.float32) * 0.1)
          for _, co, _, _ in CHAIN]
    x0 = jnp.asarray(np.abs(rng.randn(T, 1, H, W)).astype(np.float32))

    def conv(x, w, prec=None):
        return lax.conv_general_dilated(
            x.astype(dtype), w.astype(dtype), window_strides=(1, 1),
            padding="SAME", dimension_numbers=("NCHW", "HWIO", "NCHW"),
            preferred_element_type=jnp.float32,
            precision=prec or precision)

    def stem_conv1(x):
        """conv1 (+pool1 for the s2d leg) under the chosen formulation."""
        w1, b1 = ws[0], bs[0]
        if stem == "conv":
            y = leaky(conv(x, w1) + b1.reshape(-1, 1, 1))
            return pool2(y)
        if stem in ("im2col", "im2col_k128"):
            patches = lax.conv_general_dilated_patches(
                x.astype(dtype), (3, 3), (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )  # [T, 9, H, W]
            m = patches.transpose(0, 2, 3, 1).reshape(-1, 9)
            wmat = w1.reshape(9, -1).astype(dtype)
            if stem == "im2col_k128":
                m = jnp.pad(m, ((0, 0), (0, 119)))
                wmat = jnp.pad(wmat, ((0, 119), (0, 0)))
            y = lax.dot_general(
                m, wmat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            ).reshape(T, H, W, -1).transpose(0, 3, 1, 2)
            return pool2(leaky(y + bs[0].reshape(-1, 1, 1)))
        if stem == "s2d":
            w_oihw = jnp.transpose(w1, (3, 2, 0, 1))
            w2 = build_s2d_kernel(w_oihw)
            z = space_to_depth(x)
            out = lax.conv_general_dilated(
                z.astype(dtype),
                jnp.transpose(w2, (2, 3, 1, 0)).astype(dtype),
                window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NCHW", "HWIO", "NCHW"),
                preferred_element_type=jnp.float32, precision=precision)
            out = out + jnp.tile(bs[0], 4).reshape(-1, 1, 1)
            out = leaky(out)
            o = ws[0].shape[-1]
            return out.reshape(T, 4, o, H // 2, W // 2).max(axis=1)
        raise ValueError(stem)

    def step(x):
        y = stem_conv1(x)
        for (ci, co, k, has_pool), w, b in list(zip(CHAIN, ws, bs))[1:]:
            y = leaky(conv(y, w) + b.reshape(-1, 1, 1))
            if has_pool:
                y = pool2(y)
        return jnp.mean(y, dtype=jnp.float32)

    @jax.jit
    def chained(seed):
        def body(c, _):
            out = step(x0 + c)  # every operand depends on the carry
            return c * jnp.float32(0.5) + out, ()
        c, _ = lax.scan(body, seed, None, length=K)
        return c

    return chained


def main():
    rows = []
    for tier, precision, dtype in (
        ("bf16", lax.Precision.DEFAULT, jnp.bfloat16),
        ("f32_highest", lax.Precision.HIGHEST, jnp.float32),
    ):
        for stem in ("conv", "im2col", "im2col_k128", "s2d"):
            try:
                leg = make_leg(stem, precision, dtype)
                dt = timeit(leg, jnp.float32(0.01))
                row = {"leg": stem, "tier": tier,
                       "ms_per_step": round(dt / K * 1e3, 3)}
            except Exception as e:  # pragma: no cover
                row = {"leg": stem, "tier": tier, "error": str(e)[:300]}
            rows.append(row)
            print(json.dumps(row), flush=True)
    return rows


if __name__ == "__main__":
    main()
