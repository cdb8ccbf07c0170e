"""auto_window's activation-memory model validated OFF its calibration
point (round-4 verdict: single-point calibration at eFCN 160x224 could
silently under- or over-budget other geometries -> OOM or halved
throughput).  XLA's compile-time buffer assignment (memory_analysis:
temp_size = everything that is not arguments/outputs) is the measured
peak the model must cover."""

from collections import OrderedDict

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from async_ev_cnn_tpu.layers.network import EventNetwork
from async_ev_cnn_tpu.utils.config import layers_dict
from async_ev_cnn_tpu.utils.runner import pack_chunks


def _params(layer_defs, rng):
    out = {}
    for name, size in layer_defs.items():
        if "conv" in name:
            out[f"w_{name}"] = jnp.asarray(
                rng.randn(*size[:2], size[2], size[3]).astype(np.float32) * 0.1)
            out[f"b_{name}"] = jnp.asarray(
                rng.randn(size[3]).astype(np.float32) * 0.1)
    return out


GEOMETRIES = [
    # off-calibration geometries: thin stem + larger frame, deep chain on
    # a small frame, and a 2-channel (polarity) surface
    ("thin_stem_64x96",
     "conv1=3,3,1,4 pool1=2,2 conv2=3,3,4,8", 64, 96),
    ("deep_32x48",
     "conv1=3,3,1,8 pool1=2,2 conv2=3,3,8,16 pool2=2,2 conv3=3,3,16,32 "
     "pool3=2,2 conv4=1,1,32,16", 32, 48),
    ("polarity_48x48",
     "conv1=3,3,2,8 pool1=2,2 conv2=1,1,8,12", 48, 48),
]


@pytest.mark.parametrize("name,dsl,h,w", GEOMETRIES)
def test_auto_window_model_covers_measured_peak(rng, name, dsl, h, w):
    t, cap = 24, 16
    net = EventNetwork(layers_dict(dsl), h, w, leak=1e-4, alpha=0.1,
                       padding="SAME", conv_mode="full")
    params = _params(layers_dict(dsl), rng)
    state = net.init_state(params)
    n = t * cap
    cols = [rng.randint(0, h, n), rng.randint(0, w, n),
            np.sort(rng.randint(1, 5000, n))]
    if net.event_layers[0].spec.channels == 2:
        cols.append(rng.randint(0, 2, n))
    ev = np.stack(cols, axis=-1).astype(np.int32)
    chunks = pack_chunks(ev, cap)

    compiled = jax.jit(
        lambda p, s, c: net.scan_parallel(p, s, c)
    ).lower(params, state, chunks).compile()
    measured = compiled.memory_analysis().temp_size_in_bytes

    model = net.parallel_live_bytes_per_chunk()
    budgeted = 2 * model * t  # the 2x safety factor auto_window applies
    assert budgeted >= measured, (
        f"{name}: auto_window would over-pack the budget — model "
        f"{budgeted} B (2 * {model} B/chunk * {t}) < measured XLA temp "
        f"{measured} B")
    # ... and not so conservative that windows collapse (>30x would
    # silently shrink dispatch windows and halve throughput)
    assert model * t <= 30 * max(measured, 1), (
        f"{name}: model {model * t} B is >30x the measured {measured} B")


def test_auto_window_respects_budget_boundaries():
    """auto_window's arithmetic: the derived window fits the budget under
    the model, returns None when everything fits, and never returns 0."""
    net = EventNetwork(layers_dict("conv1=3,3,1,4 pool1=2,2 conv2=1,1,4,8"),
                       32, 32, leak=1e-4, alpha=0.1, padding="SAME",
                       conv_mode="full")
    per = net.parallel_live_bytes_per_chunk()
    # a budget for ~10 chunks
    budget_mb = 10 * 2 * per / 2**20
    win = net.auto_window(1000, budget_mb)
    assert win is not None and 1 <= win <= 10
    assert 2 * per * win <= budget_mb * 2**20
    assert net.auto_window(win, budget_mb) is None  # all fits
    assert net.auto_window(1000, 1e-9) == 1  # floor, never 0
