"""Topology fuzz for the async-vs-dense equivalence gate.

The fixed test nets pin the reference geometry; this fuzz sweeps random
layer stacks (kernel sizes, channel widths, pool placement, padding,
leak/alpha) through the same lockstep harness, catching composition bugs
the fixed topologies can't (e.g. VALID-padding interactions, 1x1 convs
inside incremental chains, pools at odd depths).  Seeded — failures
reproduce.
"""

from collections import OrderedDict

import numpy as np
import pytest

import jax.numpy as jnp

from async_ev_cnn_tpu.layers.network import EventNetwork
from async_ev_cnn_tpu.utils.equivalence import make_stream, run_equivalence

TOL = 1e-4


def _random_net(rs: np.random.RandomState):
    h = int(rs.choice([8, 12, 16]))
    w = int(rs.choice([8, 12, 16, 20]))
    padding = str(rs.choice(["SAME", "VALID"]))
    layer_defs = OrderedDict()
    cin, ch, cw = 1, h, w
    n_layers = int(rs.randint(2, 5))
    conv_i = pool_i = 0
    for _ in range(n_layers):
        # pools only while the map is big enough and divisible enough
        want_pool = rs.rand() < 0.35 and ch >= 4 and cw >= 4
        if want_pool:
            pool_i += 1
            layer_defs[f"pool{pool_i}"] = [2, 2]
            ch //= 2
            cw //= 2
            continue
        k = int(rs.choice([1, 3]))
        if padding == "VALID" and (ch < k or cw < k):
            k = 1
        cout = int(rs.choice([2, 4, 6]))
        conv_i += 1
        layer_defs[f"conv{conv_i}"] = [k, k, cin, cout]
        cin = cout
        if padding == "VALID":
            ch, cw = ch - k + 1, cw - k + 1
    if conv_i == 0:  # at least one conv so the net has weights
        layer_defs["conv1"] = [3 if min(ch, cw) >= 3 else 1] * 2 + [cin, 4]
        k = layer_defs["conv1"][0]
        if padding == "VALID":
            ch, cw = ch - k + 1, cw - k + 1
    params = {}
    for name, size in layer_defs.items():
        if "conv" in name:
            kh, kw, ci, co = size
            params[f"w_{name}"] = jnp.asarray(
                rs.randn(kh, kw, ci, co).astype(np.float32) * 0.4)
            params[f"b_{name}"] = jnp.asarray(
                rs.randn(co).astype(np.float32) * 0.2)
    leak = float(rs.choice([0.01, 0.05, 0.1]))
    alpha = float(rs.choice([0.0, 0.1, 0.3]))
    return layer_defs, params, h, w, leak, alpha, padding


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("conv_mode", ["dense", "full"])
def test_random_topology_equivalence(seed, conv_mode):
    rs = np.random.RandomState(1000 + seed)
    layer_defs, params, h, w, leak, alpha, padding = _random_net(rs)
    net = EventNetwork(layer_defs, h, w, leak=leak, alpha=alpha,
                       padding=padding, conv_mode=conv_mode)
    chunks = make_stream(rs, steps=150, events_per_step=4, h=h, w=w)
    report = run_equivalence(net, params, chunks)
    for name, diff in report.max_diff.items():
        assert diff <= TOL, (
            f"seed {seed} mode {conv_mode} layer {name}: {diff:.2e} > {TOL}; "
            f"net={dict(layer_defs)} pad={padding} leak={leak} alpha={alpha}"
        )


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(6, 14))
def test_random_topology_equivalence_more(seed):
    """Wider sweep incl. longer streams, both modes per seed."""
    rs = np.random.RandomState(1000 + seed)
    layer_defs, params, h, w, leak, alpha, padding = _random_net(rs)
    chunks = make_stream(rs, steps=400, events_per_step=5, h=h, w=w)
    for conv_mode in ("dense", "full"):
        net = EventNetwork(layer_defs, h, w, leak=leak, alpha=alpha,
                           padding=padding, conv_mode=conv_mode)
        report = run_equivalence(net, params, chunks)
        for name, diff in report.max_diff.items():
            assert diff <= TOL, (
                f"seed {seed} mode {conv_mode} layer {name}: {diff:.2e}; "
                f"net={dict(layer_defs)} pad={padding}"
            )
