"""Tests for event-stream preprocessing transforms."""

import numpy as np

from async_ev_cnn_tpu.utils.transforms import center_crop, data_transform


def test_center_crop_events(rng):
    # events spanning a 30x40 extent cropped to 10x12
    n = 400
    x = rng.randint(0, 40, n).astype(np.int32)
    y = rng.randint(0, 30, n).astype(np.int32)
    ts = np.sort(rng.randint(0, 1000, n)).astype(np.int32)
    p = rng.randint(0, 2, n).astype(np.int32)
    bboxes = np.array([[0.5, 0.5, 0.2, 0.2, 1, 0]], np.float32)

    l, nx, ny, nts, np_, bb = center_crop(n, x, y, ts, p, bboxes, (30, 40), (10, 12))
    assert l == len(nx)
    assert nx.min() == 0 and ny.min() == 0
    assert nx.max() < 12 and ny.max() < 10
    # crop window is centered on the event extent per axis (the reference
    # swaps the axes, utils.py:17-18 — fixed here)
    assert 0.0 <= bb[0, 0] <= 1.0 and 0.0 <= bb[0, 1] <= 1.0


def test_center_crop_preserves_box_size(rng):
    """Width/height columns only RESCALE under a crop; subtracting the
    crop offset from them (the old behavior) shrank every box and zeroed
    narrow ones."""
    n = 500
    x = rng.randint(0, 40, n).astype(np.int32)
    y = rng.randint(0, 30, n).astype(np.int32)
    ts = np.sort(rng.randint(0, 1000, n)).astype(np.int32)
    p = rng.randint(0, 2, n).astype(np.int32)
    # box of 8x6 pixels centered mid-frame
    bboxes = np.array([[0.5, 0.5, 8 / 40, 6 / 30, 1, 0]], np.float32)
    _, _, _, _, _, bb = center_crop(n, x, y, ts, p, bboxes, (30, 40), (10, 12))
    np.testing.assert_allclose(bb[0, 2], 8 / 12, atol=1e-6)  # width rescaled
    np.testing.assert_allclose(bb[0, 3], 6 / 10, atol=1e-6)  # height rescaled


def test_center_crop_noop_when_same_shape(rng):
    class A:
        frame_h = frame_w = 8
        example_h = example_w = 8

    n = 20
    x = rng.randint(0, 8, n)
    y = rng.randint(0, 8, n)
    ts = np.sort(rng.randint(10, 100, n))
    p = rng.randint(0, 2, n)
    l, events = data_transform(n, x, y, ts, p, None, A())
    assert events.shape == (n, 3)
    assert events[0, 2] == 0  # ts rebased to zero
    np.testing.assert_array_equal(events[:, 0], y)
    np.testing.assert_array_equal(events[:, 1], x)


def test_center_crop_empty_window():
    # all events outside the crop window -> zero-length result, no crash
    x = np.array([0, 39], np.int32)
    y = np.array([0, 29], np.int32)
    ts = np.array([1, 2], np.int32)
    p = np.array([0, 1], np.int32)
    l, nx, ny, nts, np_, bb = center_crop(
        2, x, y, ts, p, np.zeros((1, 6), np.float32), (30, 40), (2, 2)
    )
    assert l == 0 and len(nx) == 0


def test_center_crop_drops_fully_cropped_out_boxes(rng):
    """A box whose CENTER falls outside the crop window is cropped out:
    its w/h zero (downstream target builders drop w/h <= 0 rows) instead
    of surviving as a spurious full-size edge box (advisor finding)."""
    from async_ev_cnn_tpu.utils.transforms import center_crop

    old_h, old_w = 40, 40
    new_h, new_w = 10, 10
    # events spread over the full extent -> centered 10x10 window
    n = 500
    x = rng.randint(0, old_w, n).astype(np.int32)
    y = rng.randint(0, old_h, n).astype(np.int32)
    ts = np.sort(rng.randint(0, 1000, n)).astype(np.int32)
    p = np.zeros(n, np.int32)
    # box 0: center at the frame corner (far outside the center crop);
    # box 1: center mid-frame (inside the crop)
    bboxes = np.array([
        [2 / old_w, 2 / old_h, 8 / old_w, 8 / old_h],
        [0.5, 0.5, 8 / old_w, 8 / old_h],
    ], np.float32)
    _, _, _, _, _, bb = center_crop(
        n, x, y, ts, p, bboxes, (old_h, old_w), (new_h, new_w))
    assert bb[0, 2] == 0 and bb[0, 3] == 0, "cropped-out box must zero w/h"
    assert bb[1, 2] > 0 and bb[1, 3] > 0
    assert 0 <= bb[1, 0] <= 1 and 0 <= bb[1, 1] <= 1


def test_eval_transform_drops_zero_area_ground_truth():
    """scripts/evaluate drops w/h<=0 rows after the crop: a zero-area
    ground truth can never be matched (IoU 0) and would permanently
    deflate recall/mAP for its class."""
    from types import SimpleNamespace

    from async_ev_cnn_tpu.scripts.evaluate import _eval_transform

    rng = np.random.RandomState(0)
    old_h = old_w = 40
    args = SimpleNamespace(example_h=old_h, example_w=old_w,
                           frame_h=10, frame_w=10)
    n = 500
    x = rng.randint(0, old_w, n).astype(np.int32)
    y = rng.randint(0, old_h, n).astype(np.int32)
    ts = np.sort(rng.randint(0, 1000, n)).astype(np.int32)
    p = np.zeros(n, np.int32)
    bboxes = np.array([
        [2 / old_w, 2 / old_h, 8 / old_w, 8 / old_h, 0.0],  # cropped out
        [0.5, 0.5, 8 / old_w, 8 / old_h, 1.0],              # survives
    ], np.float32)
    _, _, bb = _eval_transform(n, x, y, ts, p, bboxes, args)
    assert bb.shape[0] == 1, "zero-area GT row must be dropped"
    assert bb[0, 4] == 1.0 and bb[0, 2] > 0 and bb[0, 3] > 0
