"""Visualisation smoke tests (no GUI): decode + NMS + box rasterisation."""

import numpy as np

from async_ev_cnn_tpu.utils.viz import draw_bboxes


def make_grid_with_box(num_classes=3, num_bbox=2, sh=4, sw=4, conf=0.9):
    grid = np.zeros((sh, sw, num_classes + num_bbox * 5), np.float32)
    grid[1, 2, :num_classes] = [0.1, 0.8, 0.1]
    # box 0 of cell (1,2): centered, 1/4-image-sized, high confidence
    grid[1, 2, num_classes : num_classes + 5] = [0.5, 0.5, 0.5, 0.5, conf]
    return grid


def test_draw_bboxes_renders(rng):
    frame = rng.rand(32, 32).astype(np.float32)
    grid = make_grid_with_box()
    imgs = draw_bboxes(grid, frame, 4, 4, 3, conf_threshold=0.2, use_nms=True,
                       highlight_top_n=1)
    assert imgs.shape == (1, 32, 32, 3)
    base = np.repeat(((frame - frame.min()) / (frame.max() - frame.min()))[..., None], 3, -1)
    assert not np.allclose(imgs[0], base)  # something was drawn


def test_draw_bboxes_below_threshold_draws_nothing(rng):
    frame = rng.rand(32, 32).astype(np.float32)
    grid = make_grid_with_box(conf=0.05)
    imgs = draw_bboxes(grid, frame, 4, 4, 3, conf_threshold=0.2)
    base = np.repeat(((frame - frame.min()) / (frame.max() - frame.min()))[..., None], 3, -1)
    np.testing.assert_allclose(imgs[0], base, atol=1e-6)


def test_draw_bboxes_resize(rng):
    frame = rng.rand(16, 16).astype(np.float32)
    imgs = draw_bboxes(make_grid_with_box(), frame, 4, 4, 3, resize_ratio=3)
    assert imgs.shape == (1, 48, 48, 3)
