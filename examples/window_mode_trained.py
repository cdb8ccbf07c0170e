"""Train an eFCN checkpoint on synthetic clustered-event detection data,
then measure window-mode inference against dense-masked and full modes on
the same clustered streams (ROADMAP: window mode with trained weights).

The hypothesis from docs/performance.md: with *random* weights, leak-driven
sign flips make deep-layer active masks global every chunk and window mode
degenerates to its dense fallback; with *trained* weights whose deep
activations are stable, the active region stays near the object and the
windowed conv (one dynamic slice, O(active-region) work) can win.

Run on the TPU (from the repo root):
    python examples/window_mode_trained.py [--steps 300]

Measured 2026-08-16 (200 steps, loss 2077 -> 0.23, clustered streams):
dense-masked 212k ev/s, window 213k, mixed @window/@full 246k, full 545k —
see docs/performance.md "Window mode".
"""

import argparse
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

from async_ev_cnn_tpu.layers.network import EventNetwork
from async_ev_cnn_tpu.models.train import Trainer, YoloTargets
from async_ev_cnn_tpu.ops.integrate import integrate_parallel
from async_ev_cnn_tpu.utils.config import layers_dict
from async_ev_cnn_tpu.utils.runner import pack_chunks

EFCN_DSL = (
    "conv1=3,3,1,16 pool1=2,2 conv2=3,3,16,32 pool2=2,2 conv3=3,3,32,64 "
    "pool3=2,2 conv4=3,3,64,128 pool4=2,2 conv5=3,3,128,256 pool5=2,2 "
    "conv6=1,1,256,512 conv7=1,1,512,110"
)
H, W = 160, 224
LEAK = 5e-5
CHUNK_EVENTS = 200
CAPACITY = 256
NUM_CLASSES, NUM_BBOX = 100, 2
GRID = (5, 7)


def clustered_stream(rng, steps, events_per_step, radius=8, rate_us=15):
    n = steps * events_per_step
    ts = np.cumsum(rng.randint(1, rate_us, size=n)).astype(np.int32)
    t = np.arange(n) / events_per_step
    cy = H / 2 + H / 3 * np.sin(t * 0.05)
    cx = W / 2 + W / 3 * np.cos(t * 0.04)
    y = np.clip(np.round(cy + rng.randn(n) * radius), 0, H - 1).astype(np.int32)
    x = np.clip(np.round(cx + rng.randn(n) * radius), 0, W - 1).astype(np.int32)
    return np.stack([y, x, ts], axis=-1), cy, cx


def make_training_batch(rng, net, params, batch):
    """Integrated clustered-stream frames + blob-center YOLO targets —
    training inputs share the inference-time surface statistics."""
    t_chunks = 16
    frames, boxes, objs, clss = [], [], [], []
    ispec = net.event_layers[0].spec
    for _ in range(batch):
        ev, cy, cx = clustered_stream(rng, t_chunks, CHUNK_EVENTS,
                                      radius=float(rng.randint(4, 12)))
        chunks = pack_chunks(ev, CAPACITY)
        surfs, _ = integrate_parallel(
            jnp.zeros(ispec.out_shape, jnp.float32), jnp.int32(0), chunks, LEAK
        )
        frames.append(np.asarray(surfs[-1, 0]))
        # target: one box at the blob's current center
        bcy, bcx = cy[-1], cx[-1]
        sh, sw = GRID
        cell_h, cell_w = H / sh, W / sw
        iy, ix = int(bcy // cell_h), int(bcx // cell_w)
        box = np.zeros((sh, sw, 4), np.float32)
        obj = np.zeros((sh, sw), np.float32)
        cls = np.zeros((sh, sw), np.int32)
        box[iy, ix] = [bcx % cell_w / cell_w, bcy % cell_h / cell_h,
                       40.0 / W, 40.0 / H]
        obj[iy, ix] = 1.0
        cls[iy, ix] = 0
        boxes.append(box); objs.append(obj); clss.append(cls)
    return (
        jnp.asarray(np.stack(frames)),
        YoloTargets(
            boxes=jnp.asarray(np.stack(boxes)),
            obj=jnp.asarray(np.stack(objs)),
            cls=jnp.asarray(np.stack(clss)),
        ),
    )


def bench_mode(net, params, events, label, dispatches=4):
    state = net.init_state(params)
    chunks = pack_chunks(events, CAPACITY)
    fn = jax.jit(lambda s, c: net.scan(params, s, c))
    st, outs = fn(state, chunks)
    np.asarray(outs[-1])
    best = float("inf")
    for _ in range(3):
        st = state
        t0 = time.time()
        for _ in range(dispatches):
            st, outs = fn(st, chunks)
        np.asarray(outs[-1])
        best = min(best, time.time() - t0)
    eps = events.shape[0] * dispatches / best
    print(f"{label}: {eps:,.0f} ev/s", flush=True)
    return eps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="/tmp/efcn_trained.npz")
    ap.add_argument("--window_frac", type=float, default=0.5)
    args = ap.parse_args()

    layer_defs = layers_dict(EFCN_DSL)
    rng = np.random.RandomState(0)
    params = {}
    for name, size in layer_defs.items():
        if "conv" in name:
            kh, kw, ci, co = size
            fan_in = kh * kw * ci
            params[f"w_{name}"] = jnp.asarray(
                rng.randn(kh, kw, ci, co).astype(np.float32) * np.sqrt(2.0 / fan_in))
            params[f"b_{name}"] = jnp.zeros(co, jnp.float32)

    net = EventNetwork(layer_defs, H, W, leak=LEAK, alpha=0.1, padding="SAME")
    trainer = Trainer(net, NUM_CLASSES, NUM_BBOX, GRID)
    opt_state = trainer.init(params)

    t0 = time.time()
    for i in range(args.steps):
        frames, targets = make_training_batch(rng, net, params, args.batch)
        params, opt_state, loss = trainer.step(params, opt_state, frames, targets)
        if i % 25 == 0:
            print(f"step {i}: loss {float(loss):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    print(f"trained {args.steps} steps in {time.time() - t0:.0f}s, "
          f"final loss {float(loss):.4f}", flush=True)

    from async_ev_cnn_tpu.utils.checkpoint import save_params

    save_params(args.out, {k: np.asarray(v) for k, v in params.items()})
    print(f"checkpoint -> {args.out}", flush=True)

    # ---- inference comparison on clustered streams, trained weights -----
    ev, _, _ = clustered_stream(np.random.RandomState(7), 50, CHUNK_EVENTS)
    results = {}
    for mode, frac in (("dense", None), ("window", args.window_frac), ("full", None)):
        kw = {"window_frac": frac} if frac else {}
        m_net = EventNetwork(layer_defs, H, W, leak=LEAK, alpha=0.1,
                             padding="SAME", conv_mode=mode, **kw)
        results[mode] = bench_mode(m_net, params, ev, f"trained/{mode}")
    # mixed: window early (big maps), full late (as the @mode DSL would set)
    mixed_dsl = EFCN_DSL.replace("conv1=3,3,1,16", "conv1=3,3,1,16@window") \
                        .replace("conv2=3,3,16,32", "conv2=3,3,16,32@window") \
                        .replace("conv3=3,3,32,64", "conv3=3,3,32,64@full")
    m_net = EventNetwork(layers_dict(mixed_dsl), H, W, leak=LEAK, alpha=0.1,
                         padding="SAME", window_frac=args.window_frac)
    results["mixed_window_full"] = bench_mode(m_net, params, ev, "trained/mixed w,w,full...")
    print(json.dumps({k: round(v, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
