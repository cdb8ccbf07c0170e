"""Gates for the space-to-depth conv+pool fusion (ops/stem.py)."""

from collections import OrderedDict

import numpy as np
import pytest

import jax.numpy as jnp

from async_ev_cnn_tpu.ops.conv import conv2d_dense, leaky
from async_ev_cnn_tpu.ops.pool import maxpool_dense
from async_ev_cnn_tpu.ops.stem import (
    build_s2d_kernel,
    fused_conv_pool,
    s2d_pair_wins,
    space_to_depth,
)


@pytest.mark.parametrize("cin,cout,h,w", [
    (1, 16, 16, 24), (2, 8, 12, 12), (16, 32, 8, 14),
])
def test_fused_conv_pool_matches_direct(rng, cin, cout, h, w):
    x = jnp.asarray(rng.randn(cin, h, w).astype(np.float32))
    k = jnp.asarray(rng.randn(cout, cin, 3, 3).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
    direct = maxpool_dense(
        leaky(conv2d_dense(x, k, b, 1, "SAME"), 0.1), (2, 2), 2, "VALID"
    )
    fused = fused_conv_pool(x, k, b, 0.1)
    assert fused.shape == direct.shape == (cout, h // 2, w // 2)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(direct), atol=1e-5, rtol=1e-5
    )


def test_space_to_depth_layout(rng):
    x = jnp.asarray(rng.randn(3, 4, 6).astype(np.float32))
    z = space_to_depth(x)
    assert z.shape == (12, 2, 3)
    # channel index = c*4 + r*2 + s
    for c in range(3):
        for r in range(2):
            for s in range(2):
                np.testing.assert_array_equal(
                    np.asarray(z[c * 4 + r * 2 + s]),
                    np.asarray(x[c, r::2, s::2]),
                )


def test_build_s2d_kernel_preserves_map(rng):
    """conv(Z, W2) phase channels == direct conv at the phase pixels."""
    from jax import lax

    cin, cout, h, w = 2, 4, 8, 10
    x = jnp.asarray(rng.randn(cin, h, w).astype(np.float32))
    k = jnp.asarray(rng.randn(cout, cin, 3, 3).astype(np.float32))
    direct = conv2d_dense(x, k, None, 1, "SAME")
    z = space_to_depth(x)[None]
    out = lax.conv_general_dilated(
        z, build_s2d_kernel(k), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0].reshape(2, 2, cout, h // 2, w // 2)
    for a in range(2):
        for b in range(2):
            np.testing.assert_allclose(
                np.asarray(out[a, b]),
                np.asarray(direct[:, a::2, b::2]),
                atol=1e-5, rtol=1e-5,
            )


def test_pair_cost_model():
    """Thin stems fuse; deep layers (contraction already MXU-filling)
    don't."""
    from async_ev_cnn_tpu.layers.conv2d import ConvSpec

    def spec(cin, cout, h=32, w=32):
        return ConvSpec(
            in_shape=(cin, h, w), out_channels=cout, ksize=(3, 3),
            stride=1, alpha=0.1, padding="SAME", mode="full",
        )

    assert s2d_pair_wins(spec(1, 16))
    assert s2d_pair_wins(spec(2, 16))   # polarity-channel stem
    # measured on v5e: fusing Cin=16 regresses the whole step ~+3 ms
    # (ops/stem.py s2d_pair_wins docstring) — deeper layers never fuse
    assert not s2d_pair_wins(spec(16, 32))
    assert not s2d_pair_wins(spec(32, 64))
    assert not s2d_pair_wins(spec(128, 256))


def test_network_selects_pairs():
    from async_ev_cnn_tpu.layers.network import EventNetwork
    from async_ev_cnn_tpu.utils.config import layers_dict

    dsl = ("conv1=3,3,1,16 pool1=2,2 conv2=3,3,16,32 pool2=2,2 "
           "conv3=3,3,32,64 pool3=2,2 conv4=1,1,64,12")
    net = EventNetwork(layers_dict(dsl), 160, 224, leak=5e-5, alpha=0.1,
                       padding="SAME", conv_mode="full", stem_fusion=True)
    # event_layers[1:]: conv1@0 pool1@1 conv2@2 pool2@3 conv3@4 pool3@5 conv4@6
    assert net._s2d_pairs == frozenset({0})
    # default 'auto': the pair is a CANDIDATE, but the trace-time gate
    # fuses only at demoted matmul tiers (measured-win regime) — at the
    # default HIGHEST precision nothing fuses
    net_default = EventNetwork(layers_dict(dsl), 160, 224, leak=5e-5,
                               alpha=0.1, padding="SAME", conv_mode="full")
    assert net_default._s2d_pairs == frozenset({0})
    assert not net_default._fusion_active()  # tests pin HIGHEST
    # stem_fusion=False forces the fusion off at any tier; the CANDIDATE
    # set is still computed (so with_stem_fusion can upgrade the clone)
    net_off = EventNetwork(layers_dict(dsl), 160, 224, leak=5e-5,
                           alpha=0.1, padding="SAME", conv_mode="full",
                           stem_fusion=False)
    assert net_off._s2d_pairs == frozenset({0})
    assert not net_off._fusion_active()
    # with_stem_fusion: shallow clone flips only the trace-time policy
    net_on = net_off.with_stem_fusion(True)
    assert net_on._fusion_active()  # tests pin HIGHEST; True fuses there
    assert not net_off._fusion_active()  # original untouched
    assert net_on.event_layers is net_off.event_layers  # specs shared
    with pytest.raises(ValueError, match="stem_fusion"):
        net_off.with_stem_fusion(1)
    with pytest.raises(ValueError, match="stem_fusion"):
        EventNetwork(layers_dict(dsl), 160, 224, leak=5e-5, alpha=0.1,
                     padding="SAME", conv_mode="full", stem_fusion="yes")
    # 1 == True but 1 is not True: the constructor must reject it loudly
    # (an equality check would accept it and _fusion_active would then
    # silently never fuse)
    with pytest.raises(ValueError, match="stem_fusion"):
        EventNetwork(layers_dict(dsl), 160, 224, leak=5e-5, alpha=0.1,
                     padding="SAME", conv_mode="full", stem_fusion=1)
    # odd input dims -> the stem pair can't fuse
    net_odd = EventNetwork(layers_dict(dsl), 161, 224, leak=5e-5, alpha=0.1,
                           padding="SAME", conv_mode="full", stem_fusion=True)
    assert net_odd._s2d_pairs == frozenset()
    # non-full modes never fuse
    net_d = EventNetwork(layers_dict(dsl), 160, 224, leak=5e-5, alpha=0.1,
                         padding="SAME", conv_mode="dense", stem_fusion=True)
    assert net_d._s2d_pairs == frozenset()


def test_demoted_precision_flag_controls_fusion(rng):
    """stem.allow_demoted_precision gates the fused pair at non-HIGHEST
    matmul tiers: flag off -> direct convs (the historical behavior),
    flag on -> fused, with outputs equal to the direct path (the s2d
    contraction multiplies the identical rounded product set — only f32
    accumulation order differs)."""
    import jax

    from async_ev_cnn_tpu.layers.network import EventNetwork
    from async_ev_cnn_tpu.ops import stem
    from async_ev_cnn_tpu.ops.conv import set_matmul_precision
    from async_ev_cnn_tpu.utils.config import layers_dict

    dsl = "conv1=3,3,1,4 pool1=2,2 conv2=1,1,4,6"
    layer_defs = layers_dict(dsl)
    params = {}
    for name, size in layer_defs.items():
        if "conv" in name:
            kh, kw, ci, co = size
            params[f"w_{name}"] = jnp.asarray(
                rng.randn(kh, kw, ci, co).astype(np.float32) * 0.3)
            params[f"b_{name}"] = jnp.asarray(
                rng.randn(co).astype(np.float32) * 0.1)
    net = EventNetwork(layer_defs, 16, 16, leak=0.01, alpha=0.1,
                       padding="SAME", conv_mode="full", stem_fusion=True)
    assert net._s2d_pairs
    state = net.init_state(params)
    frame = jnp.asarray(rng.rand(1, 16, 16).astype(np.float32))

    def fused_in_program():
        jx = jax.make_jaxpr(
            lambda f: net.full_frame_forward(params, state, f))(frame)
        return "(16, 4, 3, 3)" in str(jx)  # the rearranged [4*O, 4*Cin] kernel

    old_flag = stem.allow_demoted_precision
    try:
        set_matmul_precision("highest")
        assert fused_in_program()  # HIGHEST always fuses
        set_matmul_precision("default")
        stem.allow_demoted_precision = False
        assert not fused_in_program()
        ref = np.asarray(net.full_frame_forward(params, state, frame))
        stem.allow_demoted_precision = True
        assert fused_in_program()
        got = np.asarray(net.full_frame_forward(params, state, frame))
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)
    finally:
        stem.allow_demoted_precision = old_flag
        set_matmul_precision("highest")


def test_auto_mode_fuses_only_at_demoted_tiers(rng):
    """stem_fusion='auto' (the default) follows the measurements: no
    fusion at f32 HIGHEST (round-3 wash), fused at demoted tiers (the
    1.15x bit-exact win, examples/stem_bf16_retest.py), off again if
    ops.stem.allow_demoted_precision is cleared; outputs at the demoted
    tier equal the direct path."""
    import jax

    from async_ev_cnn_tpu.layers.network import EventNetwork
    from async_ev_cnn_tpu.ops import stem
    from async_ev_cnn_tpu.ops.conv import set_matmul_precision
    from async_ev_cnn_tpu.utils.config import layers_dict

    dsl = "conv1=3,3,1,4 pool1=2,2 conv2=1,1,4,6"
    layer_defs = layers_dict(dsl)
    params = {}
    for name, size in layer_defs.items():
        if "conv" in name:
            kh, kw, ci, co = size
            params[f"w_{name}"] = jnp.asarray(
                rng.randn(kh, kw, ci, co).astype(np.float32) * 0.3)
            params[f"b_{name}"] = jnp.asarray(
                rng.randn(co).astype(np.float32) * 0.1)
    net = EventNetwork(layer_defs, 16, 16, leak=0.01, alpha=0.1,
                       padding="SAME", conv_mode="full")  # default 'auto'
    assert net._s2d_pairs == frozenset({0})
    state = net.init_state(params)
    frame = jnp.asarray(rng.rand(1, 16, 16).astype(np.float32))

    def fused_in_program():
        jx = jax.make_jaxpr(
            lambda f: net.full_frame_forward(params, state, f))(frame)
        return "(16, 4, 3, 3)" in str(jx)  # the rearranged s2d kernel

    old_flag = stem.allow_demoted_precision
    try:
        set_matmul_precision("highest")
        assert not net._fusion_active() and not fused_in_program()
        ref = np.asarray(net.full_frame_forward(params, state, frame))
        set_matmul_precision("default")
        stem.allow_demoted_precision = True
        assert net._fusion_active() and fused_in_program()
        got = np.asarray(net.full_frame_forward(params, state, frame))
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)
        # the 'high' (bf16x3) cell measured a wash (fused 6.24-6.25M vs
        # unfused 6.25-6.29M ev/s, examples/stem_fusion_followup_ab.py)
        # — 'auto' leaves it unfused (stem_fusion=True forces it)
        set_matmul_precision("high")
        assert not net._fusion_active() and not fused_in_program()
        set_matmul_precision("default")
        stem.allow_demoted_precision = False
        assert not net._fusion_active() and not fused_in_program()
        # 'auto' also requires f32 activation storage: under bf16 storage
        # the fusion measured a slight loss (examples/stem_bf16act_ab.py),
        # so the candidate pair stays unfused at any tier...
        stem.allow_demoted_precision = True
        net16 = EventNetwork(layer_defs, 16, 16, leak=0.01, alpha=0.1,
                             padding="SAME", conv_mode="full",
                             activation_dtype="bfloat16")
        assert net16._s2d_pairs == frozenset({0})
        assert not net16._fusion_active()
        # ...while an explicit True still forces it on
        net16_f = EventNetwork(layer_defs, 16, 16, leak=0.01, alpha=0.1,
                               padding="SAME", conv_mode="full",
                               stem_fusion=True,
                               activation_dtype="bfloat16")
        assert net16_f._fusion_active()
    finally:
        stem.allow_demoted_precision = old_flag
        set_matmul_precision("highest")


def test_full_frame_forward_fused_matches_layerwise(rng):
    """The fused time-batched forward equals running the layers one by one,
    including when the profiler's `upto` cuts inside a fused pair."""
    from async_ev_cnn_tpu.layers.network import EventNetwork
    from async_ev_cnn_tpu.utils.config import layers_dict

    dsl = "conv1=3,3,1,4 pool1=2,2 conv2=3,3,4,8 pool2=2,2 conv3=1,1,8,6"
    layer_defs = layers_dict(dsl)
    params = {}
    for name, size in layer_defs.items():
        if "conv" in name:
            kh, kw, ci, co = size
            params[f"w_{name}"] = jnp.asarray(
                rng.randn(kh, kw, ci, co).astype(np.float32) * 0.3)
            params[f"b_{name}"] = jnp.asarray(
                rng.randn(co).astype(np.float32) * 0.1)
    net = EventNetwork(layer_defs, 16, 16, leak=0.01, alpha=0.1,
                       padding="SAME", conv_mode="full", stem_fusion=True)
    assert net._s2d_pairs  # the stem pair must be fused here
    state = net.init_state(params)
    frame = jnp.asarray(rng.rand(1, 16, 16).astype(np.float32))

    # layerwise reference: dense_forward over the same specs
    from async_ev_cnn_tpu.layers.network import dense_forward

    ref = dense_forward(net.event_layers, params, frame)
    full = net.full_frame_forward(params, state, frame)
    ref_out = net.apply_tail(
        params, jnp.transpose(next(reversed(ref.values())), (1, 2, 0))
    )
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(ref_out), atol=1e-5, rtol=1e-5
    )
    # upto cutting inside the pair (after conv1, before pool1) falls back
    # to the unfused ops and still matches the layerwise tap
    tap_conv1 = net.full_frame_forward(params, state, frame, upto=1)
    np.testing.assert_allclose(
        np.asarray(tap_conv1), np.asarray(ref["conv1"]), atol=1e-5, rtol=1e-5
    )
    tap_pool1 = net.full_frame_forward(params, state, frame, upto=2)
    np.testing.assert_allclose(
        np.asarray(tap_pool1), np.asarray(ref["pool1"]), atol=1e-5, rtol=1e-5
    )
