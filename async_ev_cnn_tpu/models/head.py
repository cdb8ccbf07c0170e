"""YOLO detection head: grid reshape and box decoding.

Capability parity with /root/reference/src/libs/viz.py:27-46 (grid-cell
offsets, sqrt-encoded width/height) and the ``[h_cells, w_cells,
C + B*5]`` output contract (event_numpy.py:101).  Implemented with jnp so it
can run on device inside the jitted step; works identically with numpy
inputs on host.
"""

from __future__ import annotations

import jax.numpy as jnp


def convert_bboxes(bboxes, grid_h: int, grid_w: int, h_image: int, w_image: int, sqrt: bool = True):
    """Grid-relative box params -> image-space (x_center, y_center, w, h).

    ``bboxes``: ``[..., grid_h, grid_w, B, 4]`` with (x, y, w, h) in cell
    units; w/h are sqrt-encoded when ``sqrt`` (viz.py:40-44).  Leading axes
    (batch/frames) broadcast.
    """
    bboxes = jnp.asarray(bboxes, jnp.float32)
    # After selecting one param, shape is [..., grid_h, grid_w, B]:
    # broadcast the column index over axis -2 and the row index over axis -3.
    col_idx = jnp.arange(grid_w, dtype=jnp.float32).reshape(grid_w, 1)
    row_idx = jnp.arange(grid_h, dtype=jnp.float32).reshape(grid_h, 1, 1)
    true_x = (bboxes[..., 0] + col_idx) / grid_w * w_image
    true_y = (bboxes[..., 1] + row_idx) / grid_h * h_image
    true_w = (jnp.square(bboxes[..., 2]) if sqrt else bboxes[..., 2]) * w_image
    true_h = (jnp.square(bboxes[..., 3]) if sqrt else bboxes[..., 3]) * h_image
    return jnp.stack([true_x, true_y, true_w, true_h], axis=-1)


def decode(
    grid_out,
    num_classes: int,
    num_bbox: int,
    h_image: int,
    w_image: int,
    sqrt: bool = True,
):
    """Decode a ``[h_cells, w_cells, C + B*5]`` grid into flat detections.

    Returns ``(boxes [N,4] xywh in pixels, scores [N], class_probs [N,C])``
    with ``N = h_cells * w_cells * B``.  Score is the box confidence;
    class probs are the cell's class distribution scaled by box confidence
    (viz.py:135-150).
    """
    grid_out = jnp.asarray(grid_out, jnp.float32)
    h_cells, w_cells = grid_out.shape[0], grid_out.shape[1]
    cls = grid_out[..., :num_classes]                              # [S,S,C]
    box = grid_out[..., num_classes:].reshape(h_cells, w_cells, num_bbox, 5)

    boxes = convert_bboxes(
        box[..., :4], h_cells, w_cells, h_image, w_image, sqrt
    ).reshape(-1, 4)
    conf = box[..., 4]
    scores = conf.reshape(-1)
    # class prob per box = cell class distribution * box confidence
    probs = (cls[:, :, None, :] * conf[..., None]).reshape(-1, num_classes)
    return boxes, scores, probs
