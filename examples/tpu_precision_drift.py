"""10k-step async-vs-dense drift vs matmul precision, ON the TPU (round 4).

The round-3 verdict: the equivalence gate passes at all three precision
tiers for short horizons, but the 1k/10k drift gates ran predominantly at
'highest' while the headline stayed there by fiat — if <=1e-4 per-layer
over 10k steps is THE contract (BASELINE.md; reference gate
test_correctness.py:137-140,175), the honest headline is the FASTEST tier
that sustains it over 10k steps on the chip.  This runs that experiment:

* the reference's exact small gate net (2 conv / 2 pool, 8x8), conv modes
  'dense' (reference-semantics incremental) and 'full' (the headline
  execution mode), 10,000 steps;
* the eFCN at flagship scale (160x224, 12 layers, leak 5e-5), 'full'
  mode, 10,000 steps of 200-event chunks;

at --matmul_precision highest / high / default.  One JSON line per cell.

Run on the TPU; uses /tmp/jax_comp_cache.  The CPU test backend treats
demoted precisions as f32, so only on-chip rows are load-bearing.
"""

import json
from collections import OrderedDict

import numpy as np


def small_net(conv_mode):
    import jax.numpy as jnp

    from async_ev_cnn_tpu.layers.network import EventNetwork

    k = np.array([[-2, -1, 1]] * 3, np.float32).reshape(3, 3, 1, 1)
    layer_defs = OrderedDict(
        [("conv1", [3, 3, 1, 1]), ("pool1", [2, 2]),
         ("conv2", [3, 3, 1, 1]), ("pool2", [2, 2])]
    )
    params = {
        "w_conv1": jnp.asarray(k), "b_conv1": jnp.asarray([10.0], jnp.float32),
        "w_conv2": jnp.asarray(k), "b_conv2": jnp.asarray([10.0], jnp.float32),
    }
    net = EventNetwork(layer_defs, 8, 8, leak=0.1, alpha=0.1, padding="SAME",
                       conv_mode=conv_mode)
    return net, params


def efcn_net(activation_dtype="float32"):
    import jax.numpy as jnp

    from async_ev_cnn_tpu.layers.network import EventNetwork
    from async_ev_cnn_tpu.utils.config import layers_dict

    dsl = ("conv1=3,3,1,16 pool1=2,2 conv2=3,3,16,32 pool2=2,2 "
           "conv3=3,3,32,64 pool3=2,2 conv4=3,3,64,128 pool4=2,2 "
           "conv5=3,3,128,256 pool5=2,2 conv6=1,1,256,512 conv7=1,1,512,110")
    defs = layers_dict(dsl)
    rng = np.random.RandomState(0)
    params = {}
    for name, size in defs.items():
        if "conv" in name:
            kh, kw, ci, co = size
            params[f"w_{name}"] = jnp.asarray(
                rng.randn(kh, kw, ci, co).astype(np.float32) * 0.05)
            params[f"b_{name}"] = jnp.asarray(
                rng.randn(co).astype(np.float32) * 0.05)
    net = EventNetwork(defs, 160, 224, leak=5e-5, alpha=0.1, padding="SAME",
                       conv_mode="full", activation_dtype=activation_dtype)
    return net, params


def main(steps=10_000):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from async_ev_cnn_tpu.ops.conv import set_matmul_precision
    from async_ev_cnn_tpu.utils.equivalence import make_stream, run_equivalence

    rng = np.random.RandomState(7)
    small_stream = make_stream(rng, steps=steps, events_per_step=5, h=8, w=8)
    efcn_stream = make_stream(rng, steps=steps, events_per_step=200,
                              h=160, w=224, max_dt=30)

    for precision in ("highest", "high", "default"):
        set_matmul_precision(precision)
        try:
            for mode in ("dense", "full"):
                net, params = small_net(mode)
                rep = run_equivalence(net, params, small_stream)
                worst = max(rep.max_diff.values())
                print(json.dumps({
                    "scale": "small_8x8", "mode": mode,
                    "precision": precision, "steps": steps,
                    "max_diff": worst, "pass_1e-4": bool(worst <= 1e-4),
                    "per_layer": {k: float(v) for k, v in rep.max_diff.items()},
                }), flush=True)
            net, params = efcn_net()
            rep = run_equivalence(net, params, efcn_stream)
            worst = max(rep.max_diff.values())
            print(json.dumps({
                "scale": "efcn_160x224", "mode": "full",
                "precision": precision, "steps": steps,
                "max_diff": worst, "pass_1e-4": bool(worst <= 1e-4),
                "per_layer": {k: float(v) for k, v in rep.max_diff.items()},
            }), flush=True)
        finally:
            set_matmul_precision("highest")

    # round-4b: bf16 ACTIVATION STORAGE (activation_dtype='bfloat16') at
    # the headline tier — the async path and the dense oracle cast at the
    # same spec-driven points, so the contract should hold exactly, like
    # the matmul tiers in 'full' mode; this run is the on-chip proof
    set_matmul_precision("default")
    try:
        net, params = efcn_net(activation_dtype="bfloat16")
        rep = run_equivalence(net, params, efcn_stream)
        worst = max(rep.max_diff.values())
        print(json.dumps({
            "scale": "efcn_160x224", "mode": "full",
            "precision": "default", "activation_dtype": "bfloat16",
            "steps": steps,
            "max_diff": worst, "pass_1e-4": bool(worst <= 1e-4),
            "per_layer": {k: float(v) for k, v in rep.max_diff.items()},
        }), flush=True)
    finally:
        set_matmul_precision("highest")


if __name__ == "__main__":
    main()
