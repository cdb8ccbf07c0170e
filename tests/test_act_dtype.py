"""activation_dtype='bfloat16': inter-layer activations stored in bf16
for 'full'-mode layers.  The contract mirrors the matmul-precision
tiers: the async path and the dense oracle cast at the same points
(spec.act_dtype drives both), so async==dense stays same-program; the
parallel-in-time path must agree with the sequential scan; and the
absolute deviation from an f32-activation run is bounded by bf16
resolution, not unbounded drift."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from async_ev_cnn_tpu.layers.network import EventNetwork
from async_ev_cnn_tpu.utils.config import layers_dict
from async_ev_cnn_tpu.utils.equivalence import make_stream, run_equivalence
H = W = 16
CAP = 32
DSL = "conv1=3,3,1,4 pool1=2,2 conv2=3,3,4,8 pool2=2,2 conv3=1,1,8,12"


def _params(rng):
    out = {}
    for name, size in layers_dict(DSL).items():
        if "conv" in name:
            out[f"w_{name}"] = jnp.asarray(
                rng.randn(*size[:2], size[2], size[3]).astype(np.float32) * 0.2
            )
            out[f"b_{name}"] = jnp.asarray(
                rng.randn(size[3]).astype(np.float32) * 0.1
            )
    return out


def _net(act, mode="full"):
    return EventNetwork(layers_dict(DSL), H, W, leak=1e-4, alpha=0.1,
                        padding="SAME", conv_mode=mode,
                        activation_dtype=act)


def test_bf16_act_async_equals_dense(rng):
    """Per-layer async-vs-dense stays exact: both sides run the same
    convs and cast at the same spec-driven points."""
    params = _params(rng)
    chunks = make_stream(rng, steps=300, events_per_step=20, h=H, w=W)
    report = run_equivalence(_net("bfloat16"), params, chunks)
    assert max(report.max_diff.values()) <= 1e-6, report


def test_bf16_act_scan_vs_scan_parallel(rng):
    params = _params(rng)
    net = _net("bfloat16")
    chunks = make_stream(rng, steps=40, events_per_step=20, h=H, w=W)
    state = net.init_state(params)
    s1, o1 = jax.jit(lambda s, c: net.scan(params, s, c))(state, chunks)
    s2, o2 = jax.jit(lambda s, c: net.scan_parallel(params, s, c))(
        state, chunks)
    # bf16 storage quantizes both paths at the same points; residual
    # differences can only come from f32 accumulation-order noise
    # crossing a bf16 rounding boundary
    assert np.max(np.abs(np.asarray(o1) - np.asarray(o2))) <= 2e-2
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2)


def test_bf16_act_absolute_fidelity_vs_f32(rng):
    """The cast is real (outputs differ from the f32-activation run) and
    bounded by bf16 resolution through the shallow net."""
    params = _params(rng)
    chunks = make_stream(rng, steps=40, events_per_step=20, h=H, w=W)
    outs = {}
    for act in ("float32", "bfloat16"):
        net = _net(act)
        state = net.init_state(params)
        _, o = jax.jit(lambda s, c, n=net: n.scan(params, s, c))(state,
                                                                 chunks)
        assert o.dtype == jnp.float32  # outputs are f32 either way
        outs[act] = np.asarray(o)
    diff = np.abs(outs["bfloat16"] - outs["float32"]).max()
    scale = np.abs(outs["float32"]).max()
    assert 0 < diff <= 0.1 * scale


def test_bf16_act_leaves_incremental_layers_f32(rng):
    """With mixed modes, only 'full' layers store bf16 — incremental
    state arithmetic keeps its exact f32 rounding fences."""
    net = _net("bfloat16", mode="dense")
    for ld in net.event_layers[1:]:
        assert ld.spec.act_dtype == "float32"
    net_full = _net("bfloat16", mode="full")
    for ld in net_full.event_layers[1:]:
        assert ld.spec.act_dtype == "bfloat16"


def test_bf16_act_composes_with_stem_fusion(rng):
    """stem_fusion + bf16 activation storage: the fused pair accumulates
    in f32 and casts once at the pooled output, while the direct path
    casts conv1's output to bf16 and pools that — so fused-vs-direct can
    differ by at most one bf16 rounding at the pair boundary (the same
    deviation class as the act-dtype knob itself), and the fused output
    dtype contract (bf16 between layers, f32 at the head) must hold."""
    params = _params(rng)
    chunks = make_stream(rng, steps=40, events_per_step=20, h=H, w=W)
    net_fused = EventNetwork(layers_dict(DSL), H, W, leak=1e-4, alpha=0.1,
                             padding="SAME", conv_mode="full",
                             stem_fusion=True, activation_dtype="bfloat16")
    assert net_fused._s2d_pairs  # the stem pair must actually fuse
    net_direct = _net("bfloat16")
    outs = {}
    for name, net in (("fused", net_fused), ("direct", net_direct)):
        state = net.init_state(params)
        _, o = jax.jit(
            lambda s, c, n=net: n.scan_parallel(params, s, c))(state, chunks)
        assert o.dtype == jnp.float32
        outs[name] = np.asarray(o)
    scale = np.abs(outs["direct"]).max()
    assert np.abs(outs["fused"] - outs["direct"]).max() <= 2e-2 * max(
        scale, 1.0)
    # ... and the fused bf16-act run stays inside the bf16 deviation
    # bound of the fused f32-act run (the cast is the only difference)
    net_f32 = EventNetwork(layers_dict(DSL), H, W, leak=1e-4, alpha=0.1,
                           padding="SAME", conv_mode="full",
                           stem_fusion=True)
    state = net_f32.init_state(params)
    _, o32 = jax.jit(
        lambda s, c: net_f32.scan_parallel(params, s, c))(state, chunks)
    assert np.abs(outs["fused"] - np.asarray(o32)).max() <= 0.1 * max(
        np.abs(np.asarray(o32)).max(), 1.0)


def test_bad_activation_dtype_rejected():
    with pytest.raises(ValueError, match="activation_dtype"):
        EventNetwork(layers_dict(DSL), H, W, leak=1e-4, alpha=0.1,
                     padding="SAME", conv_mode="full",
                     activation_dtype="float16")
