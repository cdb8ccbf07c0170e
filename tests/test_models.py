"""Model-level tests: three-way consistency of the network variants (the
reference's implicit cross-check, SURVEY.md SS4), config/DSL parsing, YOLO
head decode, NMS."""

import os
from collections import OrderedDict

import numpy as np
import jax.numpy as jnp
import pytest

from async_ev_cnn_tpu.layers.types import EventChunk
from async_ev_cnn_tpu.models import YoloEventJax, YoloFrameJax, YoloFrameNumpy
from async_ev_cnn_tpu.models.head import convert_bboxes, decode
from async_ev_cnn_tpu.ops.integrate import integrate_frame
from async_ev_cnn_tpu.utils.config import config, layers_dict, layers_dsl
from async_ev_cnn_tpu.utils.nms import apply_nms, nms, nms_jax

EFCN_DSL = "conv1=3,3,1,4 pool1=2,2 conv2=3,3,4,8 pool2=2,2 conv3=1,1,8,12"


def tiny_model_args(num_classes=2, h=16, w=16):
    layers = layers_dict(EFCN_DSL)
    return dict(
        h_frame=h, w_frame=w, num_classes=num_classes, cnn_layers=layers,
        cnn_padding="SAME", h_cells=4, w_cells=4, num_bbox=2,
        alpha=0.1, leak=0.01,
    )


def tiny_params(rng, layers):
    params = {}
    for name, size in layers.items():
        if "conv" in name:
            kh, kw, ci, co = size
            params[f"w_{name}"] = rng.randn(kh, kw, ci, co).astype(np.float32) * 0.3
            params[f"b_{name}"] = rng.randn(co).astype(np.float32) * 0.1
    return params


# ---- config / DSL ----------------------------------------------------------


def test_layers_dict_roundtrip():
    d = layers_dict(EFCN_DSL)
    assert list(d) == ["conv1", "pool1", "conv2", "pool2", "conv3"]
    assert d["conv1"] == [3, 3, 1, 4] and d["pool1"] == [2, 2]
    assert layers_dsl(d) == EFCN_DSL


def test_layers_dict_per_layer_mode():
    d = layers_dict("conv1=3,3,1,4@window pool1=2,2 conv2=3,3,4,8@sparse")
    assert d["conv1"] == [3, 3, 1, 4] and d.modes == {"conv1": "window", "conv2": "sparse"}
    assert layers_dsl(d) == "conv1=3,3,1,4@window pool1=2,2 conv2=3,3,4,8@sparse"

    from async_ev_cnn_tpu.layers.network import EventNetwork

    net = EventNetwork(d, 16, 16, leak=0.01, padding="SAME")
    modes = [ld.spec.mode for ld in net.event_layers if ld.kind == "conv"]
    assert modes == ["window", "sparse"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown conv mode"):
        EventNetwork(layers_dict("conv1=3,3,1,4@turbo"), 16, 16, leak=0.01)


def test_config_yaml_and_cli_override(tmp_path):
    cfg = tmp_path / "t.yml"
    cfg.write_text(
        "leak: 5.0e-05\nframe_h: 160\nframe_w: 224\n"
        f"yolo_cnn_layers: {EFCN_DSL}\nyolo_cnn_padding: SAME\n"
    )
    args = config(["-c", str(cfg)])
    assert args.leak == 5e-5 and args.frame_h == 160
    assert args.yolo_cnn_layers["conv3"] == [1, 1, 8, 12]
    args = config(["-c", str(cfg), "--frame_h", "320"])
    assert args.frame_h == 320  # CLI wins over file

    bad = tmp_path / "bad.yml"
    bad.write_text("not_a_flag: 1\n")
    with pytest.raises(ValueError, match="unknown config keys"):
        config(["-c", str(bad)])


# ---- three-way model consistency -------------------------------------------


def test_three_way_model_consistency(rng):
    kwargs = tiny_model_args()
    params = tiny_params(rng, kwargs["cnn_layers"])

    ev = YoloEventJax(**kwargs)
    fj = YoloFrameJax(**kwargs)
    fn = YoloFrameNumpy(**kwargs)
    for m in (ev, fj, fn):
        m.set_weights(params)

    # a short random stream
    steps, n = 20, 10
    prev = 0
    frame_state = None
    ev_graph = ev.build_graph(None)
    reset = True
    for t in range(steps):
        ts = np.sort(rng.randint(1, 50, size=n)) + prev
        prev = int(ts[-1])
        y = rng.randint(0, 16, size=n)
        x = rng.randint(0, 16, size=n)
        events = np.stack([y, x, ts], axis=-1).astype(np.int32)
        frame, last = integrate_frame(events, kwargs["leak"], 16, 16, frame_state)
        frame_state = [frame, last]
        out_ev = ev_graph(events, reset)
        reset = False
    out_fj = np.asarray(fj.build_graph(None)(np.asarray(frame)))
    out_fn = fn.build_graph(None)(np.asarray(frame))

    assert out_ev.shape == out_fj.shape == out_fn.shape == (4, 4, 12)
    np.testing.assert_allclose(out_ev, out_fj, atol=1e-4)
    # The numpy variant re-applies the activation after each pool — a
    # reference quirk (frame_numpy.py:76-78) that cascades through deeper
    # layers, so it is compared against the quirk-matching jax oracle.
    from async_ev_cnn_tpu.layers.network import dense_forward

    jp = {k: jnp.asarray(v) for k, v in params.items()}
    outs = dense_forward(fj.net.event_layers, jp, jnp.asarray(frame)[None],
                         "numpy", alpha=kwargs["alpha"])
    exp_fn = np.asarray(next(reversed(outs.values()))).transpose(1, 2, 0).reshape(4, 4, 12)
    np.testing.assert_allclose(out_fn, exp_fn, atol=1e-4)


def test_event_jax_full_mode_parallel_scan(rng):
    """YoloEventJax.scan auto-routes all-'full' networks to the
    parallel-in-time path; grids must match the sequential dense-mode scan."""
    from async_ev_cnn_tpu.utils.runner import pack_chunks

    kwargs = tiny_model_args()
    params = tiny_params(rng, kwargs["cnn_layers"])
    m_dense = YoloEventJax(conv_mode="dense", **kwargs)
    m_full = YoloEventJax(conv_mode="full", **kwargs)
    for m in (m_dense, m_full):
        m.set_weights(params)
    n = 400
    ev = np.stack([
        rng.randint(0, 16, n), rng.randint(0, 16, n),
        np.cumsum(rng.randint(1, 15, n)),
    ], -1).astype(np.int32)
    chunks = pack_chunks(ev, 64)
    _, g1 = m_dense.scan(m_dense.init_state(), chunks)
    _, g2 = m_full.scan(m_full.init_state(), chunks)
    assert g1.shape == g2.shape
    assert float(jnp.max(jnp.abs(g1 - g2))) <= 1e-4


def test_event_graph_reset(rng):
    kwargs = tiny_model_args()
    params = tiny_params(rng, kwargs["cnn_layers"])
    ev = YoloEventJax(**kwargs)
    ev.set_weights(params)
    g = ev.build_graph(None)
    events = np.array([[2, 3, 10], [5, 5, 20]], np.int32)
    a = g(events, True)
    b = g(events, True)  # reset -> identical
    np.testing.assert_array_equal(a, b)
    c = g(events, False)  # stateful continuation -> different
    assert not np.array_equal(a, c)


# ---- YOLO head --------------------------------------------------------------


def test_convert_bboxes_cell_offsets():
    # one box centered in cell (1, 2) of a 4x4 grid on an 80x80 image
    bboxes = np.zeros((4, 4, 2, 4), np.float32)
    bboxes[1, 2, 0] = [0.5, 0.5, np.sqrt(0.25), np.sqrt(0.5)]
    out = np.asarray(convert_bboxes(bboxes, 4, 4, 80, 80, sqrt=True))
    x, y, w, h = out[1, 2, 0]
    assert np.isclose(x, (0.5 + 2) / 4 * 80)
    assert np.isclose(y, (0.5 + 1) / 4 * 80)
    assert np.isclose(w, 0.25 * 80) and np.isclose(h, 0.5 * 80)


def test_decode_shapes():
    grid = np.random.RandomState(0).rand(5, 7, 110).astype(np.float32)
    boxes, scores, probs = decode(grid, num_classes=100, num_bbox=2, h_image=160, w_image=224)
    assert boxes.shape == (70, 4) and scores.shape == (70,) and probs.shape == (70, 100)


# ---- NMS --------------------------------------------------------------------


def test_nms_suppresses_overlaps():
    boxes = np.array([[10, 10, 8, 8], [11, 11, 8, 8], [40, 40, 8, 8]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    picked = nms(boxes, scores, iou_threshold=0.3)
    assert picked.tolist() == [0, 2]
    keep = np.asarray(nms_jax(jnp.asarray(boxes), jnp.asarray(scores),
                              jnp.ones(3, bool), 0.3))
    assert keep.tolist() == [True, False, True]


def test_apply_nms_batched_matches_reference_convention():
    boxes = np.array([[[10, 10, 8, 8], [11, 11, 8, 8], [40, 40, 8, 8]]], np.float32)
    scores = np.array([[0.9, 0.8, 0.7]], np.float32)
    valid = np.array([[True, True, True]])
    idx0, idx1 = apply_nms(boxes, scores, valid, iou_threshold=0.3)
    assert idx0.tolist() == [0, 0] and sorted(idx1.tolist()) == [0, 2]


def test_nms_jax_respects_valid_mask():
    boxes = jnp.asarray([[10, 10, 8, 8], [40, 40, 8, 8]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    keep = np.asarray(nms_jax(boxes, scores, jnp.asarray([True, False]), 0.5))
    assert keep.tolist() == [True, False]


def test_auto_mode_always_full():
    """'auto' is 'full' for every conv: network-level measurements showed
    full recompute beating every incremental mode end-to-end in every
    configuration tested (incl. heavy 64-channel chains at 512x640 — the
    incremental modes carry the conv-actfn second conv, 2x the FLOPs).
    The incremental modes remain explicit per-layer opt-ins."""
    from collections import OrderedDict

    from async_ev_cnn_tpu.layers.network import build_layer_defs

    def modes(defs, h, w):
        evl, _ = build_layer_defs(defs, h, w, 5e-5, 0.1, "SAME", "auto")
        return [getattr(ld.spec, "mode", None) for ld in evl if ld.kind == "conv"]

    assert modes(OrderedDict(conv1=[3, 3, 1, 16], pool1=[2, 2],
                             conv2=[3, 3, 16, 32]), 512, 640) == ["full", "full"]
    assert modes(OrderedDict(conv1=[3, 3, 1, 64], conv2=[3, 3, 64, 64],
                             conv3=[1, 1, 64, 16]), 512, 640) == \
        ["full", "full", "full"]
    assert modes(OrderedDict(conv1=[3, 3, 1, 16], pool1=[2, 2],
                             conv2=[3, 3, 16, 32]), 160, 224) == ["full", "full"]
    # explicit per-layer modes still honored (and 'full' poisons downstream)
    defs = OrderedDict(conv1=[3, 3, 1, 64], conv2=[3, 3, 64, 64])
    defs.modes = {"conv1": "sparse_rows"}
    evl, _ = build_layer_defs(defs, 512, 640, 5e-5, 0.1, "SAME", "auto")
    assert [getattr(ld.spec, "mode", None) for ld in evl if ld.kind == "conv"] == \
        ["sparse_rows", "full"]


def test_explicit_mode_after_full_rejected():
    """An EXPLICIT incremental mode downstream of a 'full' layer is a
    configuration error (full stops maintaining the mask/conv-actfn), not
    a silent coercion; implicit layers still coerce to 'full' silently."""
    from collections import OrderedDict

    from async_ev_cnn_tpu.layers.network import build_layer_defs

    defs = OrderedDict(conv1=[3, 3, 1, 8], conv2=[3, 3, 8, 8])
    defs.modes = {"conv1": "full", "conv2": "sparse_rows"}
    with pytest.raises(ValueError, match="cannot follow a 'full' layer"):
        build_layer_defs(defs, 16, 16, 0.01, 0.1, "SAME", "dense")


def test_frame_jax_channeled_input(rng):
    """A 2-channel [2, H, W] frame must run through YoloFrameJax.forward —
    an unconditional frame[None] used to double-batch it into an
    un-runnable rank-4 input."""
    from collections import OrderedDict

    from async_ev_cnn_tpu.models import YoloFrameJax

    layers = OrderedDict(conv1=[3, 3, 2, 4], pool1=[2, 2], conv2=[1, 1, 4, 12])
    m = YoloFrameJax(h_frame=16, w_frame=16, num_classes=7,
                     cnn_layers=layers, cnn_padding="SAME", h_cells=8,
                     w_cells=8, num_bbox=1, alpha=0.1, leak=1e-4)
    m.set_weights({
        "w_conv1": rng.randn(3, 3, 2, 4).astype(np.float32) * 0.2,
        "b_conv1": np.zeros(4, np.float32),
        "w_conv2": rng.randn(1, 1, 4, 12).astype(np.float32) * 0.2,
        "b_conv2": np.zeros(12, np.float32),
    })
    frame2 = rng.rand(2, 16, 16).astype(np.float32)
    out = np.asarray(m.forward(frame2))
    assert out.shape == (8, 8, 12)
