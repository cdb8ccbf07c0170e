"""Round-4 confirmation of the trained-weights window-mode negative, with
the *fit-fraction* instrumentation that explains it.

examples/window_mode_trained.py (round 3) measured the outcome: even with
a trained checkpoint, all-'full' beats window/mixed by ~2.2-2.6x at eFCN
scale.  This experiment measures the *mechanism* — per conv layer, the
fraction of chunks whose window-branch predicate actually fires
(``bbox(dilate(prev_mask)) < spec.window``, exactly as layers/conv2d.py
computes it):

* at the bench stream's cluster extent (radius 8, 256-event chunks) the
  windows fit only **0.1-0.4** of chunks even at window_frac=0.5 — most
  chunks pay the dense fallback *plus* the cond/branch machinery;
* trained and random weights give IDENTICAL fit fractions at the bench
  leak (5e-5): leak-driven sign flips are too rare over a 100-chunk
  horizon to move mask bounding boxes (the toy-scale divergence in
  tests/test_window_trained.py ran at leak 2e-4 — 4x larger — on a 25x
  smaller plane);
* deep planes (conv5+: 10x14, 5x7) are smaller than the minimum 8x8
  window, so there is nothing left to save where masks are smallest.

Fresh timing confirmation (2026-08-17, HIGHEST, clustered, trained
checkpoint, T=50 chunks/dispatch, K=8 chained): full_seq 801k ev/s,
dense-masked 257k, mixed @window(conv1-4)/@full 231k, all-window 228k,
scan_parallel 1.58M (spreads 0.004-0.13) — same ordering as round 3.

Three phases (CPU for train/fits so the tunnel is not in the loop; the
timing phase runs on the real chip):

    python examples/window_trained_perf.py train   # ~6 min, CPU
    python examples/window_trained_perf.py fits    # CPU, prints fit fracs
    python examples/window_trained_perf.py time    # TPU, prints JSON rows

Results are recorded in docs/performance.md ("Window mode").
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

PARAMS_PATH = "/tmp/wtp_params.npz"
H, W = 160, 224
LEAK = 5e-5
GRID = (5, 7)
NUM_CLASSES, NUM_BBOX = 100, 2  # conv7's 110 outputs = 100 + 2*5
EFCN_DSL = (
    "conv1=3,3,1,16 pool1=2,2 conv2=3,3,16,32 pool2=2,2 conv3=3,3,32,64 "
    "pool3=2,2 conv4=3,3,64,128 pool4=2,2 conv5=3,3,128,256 pool5=2,2 "
    "conv6=1,1,256,512 conv7=1,1,512,110"
)
RADIUS = 8  # bench.clustered_stream's cluster radius


def _force_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")


def _layer_defs(dsl=EFCN_DSL):
    from async_ev_cnn_tpu.utils.config import layers_dict

    return layers_dict(dsl)


def _init_params(rng, layer_defs):
    import jax.numpy as jnp

    params = {}
    for name, size in layer_defs.items():
        if "conv" in name:
            kh, kw, ci, co = size
            fan_in = kh * kw * ci
            params[f"w_{name}"] = jnp.asarray(
                rng.randn(kh, kw, ci, co).astype(np.float32)
                * np.sqrt(2.0 / fan_in))
            params[f"b_{name}"] = jnp.zeros(co, jnp.float32)
    return params


def _net(layer_defs, conv_mode, window_frac=0.5, modes=None):
    from async_ev_cnn_tpu.layers.network import EventNetwork

    if modes is not None:
        layer_defs = _layer_defs()  # fresh copy
        layer_defs.modes.update(modes)
    return EventNetwork(layer_defs, H, W, leak=LEAK, alpha=0.1,
                        padding="SAME", conv_mode=conv_mode,
                        window_frac=window_frac)


def _sample_stream(rng, n_events=512, radius=RADIUS):
    """One training sample: a clustered burst around a RANDOM center (the
    bench stream's center follows one fixed trajectory — training on it
    would teach position, not locality)."""
    ts = np.cumsum(rng.randint(1, 10, size=n_events)).astype(np.int32)
    cy = rng.uniform(0.2 * H, 0.8 * H)
    cx = rng.uniform(0.2 * W, 0.8 * W)
    y = np.clip(np.round(cy + rng.randn(n_events) * radius), 0, H - 1)
    x = np.clip(np.round(cx + rng.randn(n_events) * radius), 0, W - 1)
    ev = np.stack([y.astype(np.int32), x.astype(np.int32), ts], axis=-1)
    return ev, cy, cx


def cmd_train(steps=300, batch=8):
    _force_cpu()
    import jax.numpy as jnp

    from async_ev_cnn_tpu.models.train import Trainer, YoloTargets
    from async_ev_cnn_tpu.ops.integrate import integrate_parallel
    from async_ev_cnn_tpu.utils.checkpoint import save_params
    from async_ev_cnn_tpu.utils.runner import pack_chunks

    layer_defs = _layer_defs()
    rng = np.random.RandomState(0)
    params = _init_params(rng, layer_defs)
    net = _net(layer_defs, "dense")
    trainer = Trainer(net, NUM_CLASSES, NUM_BBOX, GRID)
    opt_state = trainer.init(params)
    ispec = net.event_layers[0].spec

    t0 = time.time()
    loss0 = None
    for i in range(steps):
        frames, boxes, objs, clss = [], [], [], []
        for _ in range(batch):
            ev, cy, cx = _sample_stream(rng)
            chunks = pack_chunks(ev, 64)
            surfs, _ = integrate_parallel(
                jnp.zeros(ispec.out_shape, jnp.float32), jnp.int32(0),
                chunks, LEAK)
            frames.append(np.asarray(surfs[-1, 0]))
            box = np.zeros((*GRID, 4), np.float32)
            obj = np.zeros(GRID, np.float32)
            cls = np.zeros(GRID, np.int32)
            gy = min(int(cy / H * GRID[0]), GRID[0] - 1)
            gx = min(int(cx / W * GRID[1]), GRID[1] - 1)
            obj[gy, gx] = 1.0
            box[gy, gx] = [cy / H * GRID[0] - gy, cx / W * GRID[1] - gx,
                           6 * RADIUS / W, 6 * RADIUS / H]
            cls[gy, gx] = 0
            boxes.append(box); objs.append(obj); clss.append(cls)
        targets = YoloTargets(
            boxes=jnp.asarray(np.stack(boxes)),
            obj=jnp.asarray(np.stack(objs)),
            cls=jnp.asarray(np.stack(clss)))
        params, opt_state, loss = trainer.step(
            params, opt_state, jnp.asarray(np.stack(frames)), targets)
        if loss0 is None:
            loss0 = float(loss)
        if i % 25 == 0 or i == steps - 1:
            print(f"step {i:4d}  loss {float(loss):.4f}  "
                  f"({time.time() - t0:.0f}s)", flush=True)
    save_params(PARAMS_PATH, {k: np.asarray(v) for k, v in params.items()})
    print(json.dumps({"phase": "train", "loss0": loss0,
                      "loss1": float(loss), "path": PARAMS_PATH}))


def _bench_chunks(dispatches=8, t_chunks=50, capacity=256):
    import bench

    rng = np.random.RandomState(7)
    ev = bench.clustered_stream(rng, dispatches * t_chunks, capacity,
                                radius=RADIUS)
    return bench._pack_k(ev, capacity, dispatches=dispatches)


def cmd_fits():
    _force_cpu()
    from collections import OrderedDict

    import jax
    import jax.numpy as jnp

    import bench
    from async_ev_cnn_tpu.ops.masks import dilate_mask, mask_bounding_box
    from async_ev_cnn_tpu.utils.checkpoint import load_params
    from async_ev_cnn_tpu.utils.runner import pack_chunks

    layer_defs = _layer_defs()
    rng = np.random.RandomState(7)
    ev = bench.clustered_stream(rng, 100, 256, radius=RADIUS)
    chunks = pack_chunks(ev, 256)

    trained = {k: jnp.asarray(v) for k, v in load_params(PARAMS_PATH).items()}
    random_p = _init_params(np.random.RandomState(0), layer_defs)
    net_dense = _net(layer_defs, "dense")

    for frac in (0.25, 0.5):
        net_w = _net(layer_defs, "window", window_frac=frac)
        conv_specs = OrderedDict(
            (ld.name, ld.spec)
            for ld in net_w.event_layers[1:] if ld.kind == "conv")
        prev_of, prev = {}, "intgr"
        for ld in net_w.event_layers[1:]:
            prev_of[ld.name] = prev
            prev = ld.name

        def body(state, chunk):
            state, ios = net_dense.forward(params, state, chunk)
            fits = []
            for name, spec in conv_specs.items():
                prev_mask = ios[prev_of[name]].mask
                active = dilate_mask(prev_mask, spec.ksize, spec.stride,
                                     spec.pads)
                y0, x0, y1, x1, _ = mask_bounding_box(active)
                wh, ww = spec.window
                fits.append((y1 - y0 < wh) & (x1 - x0 < ww))
            return state, jnp.stack(fits)

        for label, params in (("trained", trained), ("random", random_p)):
            state = net_dense.init_state(params)
            _, fits = jax.jit(
                lambda s, c: jax.lax.scan(body, s, c))(state, chunks)
            fits = np.asarray(fits)
            row = OrderedDict(
                (name, round(float(fits[:, i].mean()), 3))
                for i, name in enumerate(conv_specs))
            print(json.dumps({"phase": "fits", "window_frac": frac,
                              "params": label, "windows": {
                                  n: list(s.window)
                                  for n, s in conv_specs.items()},
                              "fit_frac": row}), flush=True)


def cmd_time():
    # real chip; HIGHEST precision (the incremental modes' contract tier)
    import bench

    bench._enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from async_ev_cnn_tpu.ops.conv import set_matmul_precision
    from async_ev_cnn_tpu.utils.checkpoint import load_params

    set_matmul_precision("highest")
    layer_defs = _layer_defs()
    params = {k: jnp.asarray(v) for k, v in load_params(PARAMS_PATH).items()}
    chunks, n_events = _bench_chunks()

    legs = [
        ("full_seq", dict(conv_mode="full"), "scan"),
        # reference-ethos mixing: window where planes are big, full where
        # 'full' recompute is cheap (window at conv5+ is ~the whole plane)
        ("mixed_w4_full", dict(conv_mode="full", modes={
            "conv1": "window", "conv2": "window", "conv3": "window",
            "conv4": "window"}), "scan"),
        ("window_all", dict(conv_mode="window"), "scan"),
        ("dense_seq", dict(conv_mode="dense"), "scan"),
        ("full_parallel", dict(conv_mode="full"), "scan_parallel"),
    ]
    for name, kw, runner in legs:
        net = _net(layer_defs, window_frac=0.5, **kw)
        state = net.init_state(params)
        fn = jax.jit(
            (lambda s, c, n=net: n.scan_parallel(params, s, c))
            if runner == "scan_parallel"
            else (lambda s, c, n=net: n.scan(params, s, c)))
        eps, dt, spread = bench._chained_events_per_sec(
            fn, state, chunks, n_events)
        print(json.dumps({
            "phase": "time", "leg": name,
            "events_per_sec": round(eps, 1),
            "ms_per_dispatch": round(dt / 8 * 1e3, 2),
            "spread": round(spread, 3)}), flush=True)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "train"
    {"train": cmd_train, "fits": cmd_fits, "time": cmd_time}[cmd]()
