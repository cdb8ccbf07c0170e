"""Non-maximum suppression: host (numpy) and on-device (jax) variants.

API parity with /root/reference/src/libs/utils.py:38-118 (``apply_nms`` over
center-format boxes with a validity mask, returning batch/box index pairs),
plus :func:`nms_jax` — a fixed-shape masked variant that runs under ``jit``
on TPU (score-ordered greedy suppression expressed as a ``fori_loop`` over a
static box count, no dynamic shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _iou_center(box, boxes):
    """IoU of one (x, y, w, h) center-format box against [N, 4] — the 1xM
    case of :func:`async_ev_cnn_tpu.utils.evaluation.iou_matrix` (one
    shared IoU implementation per box convention)."""
    from async_ev_cnn_tpu.utils.evaluation import iou_matrix

    return iou_matrix(np.asarray(box, np.float32)[None], boxes)[0]


def nms(boxes, scores, valid=None, iou_threshold=0.5):
    """Greedy NMS over one image's ``[N, 4]`` center-format boxes.

    Returns the selected indices (into the original array), highest score
    first.
    """
    boxes = np.asarray(boxes, np.float32)
    scores = np.asarray(scores, np.float32)
    # stable descending sort: same tie order as nms_jax's argsort(-s),
    # so host- and device-path NMS pick identical representatives
    idx = np.argsort(-scores, kind="stable")
    if valid is not None:
        # a 0/1 int mask would fancy-index (selecting wrong boxes) —
        # force the boolean-mask interpretation
        idx = idx[np.asarray(valid, bool)[idx]]
    picked = []
    alive = list(idx)
    while alive:
        best = alive.pop(0)
        picked.append(best)
        if not alive:
            break
        rest = np.array(alive)
        iou = _iou_center(boxes[best], boxes[rest])
        alive = [i for i, v in zip(alive, iou) if v < iou_threshold]
    return np.array(picked, np.int64)


def apply_nms(batch_bboxes, batch_scores, batch_valid=None, iou_threshold=0.5):
    """Batched NMS with the reference's return convention
    (utils.py:38-118): ``[batch_indices, box_indices]`` arrays."""
    batch_bboxes = np.asarray(batch_bboxes)
    if batch_valid is None:
        batch_valid = [None] * batch_bboxes.shape[0]
    idx0, idx1 = [], []
    for b, (boxes, scores, valid) in enumerate(zip(batch_bboxes, batch_scores, batch_valid)):
        picked = nms(boxes, scores, valid, iou_threshold)
        idx0.extend([b] * len(picked))
        idx1.extend(picked.tolist())
    return [np.asarray(idx0, np.int64), np.asarray(idx1, np.int64)]


def nms_jax(boxes, scores, valid, iou_threshold=0.5):
    """Jit-compatible greedy NMS: returns a keep mask ``[N]``.

    Iterates exactly N times over score-sorted boxes, suppressing against
    already-kept ones — static shapes throughout, TPU-friendly.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    b = boxes[order]
    v = valid[order]

    x1 = b[:, 0] - b[:, 2] / 2
    y1 = b[:, 1] - b[:, 3] / 2
    x2 = b[:, 0] + b[:, 2] / 2
    y2 = b[:, 1] + b[:, 3] / 2
    area = b[:, 2] * b[:, 3]

    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(0.0, ix2 - ix1) * jnp.maximum(0.0, iy2 - iy1)
    union = area[:, None] + area[None, :] - inter
    iou = inter / jnp.where(union > 0, union, 1.0)

    def body(i, keep):
        suppressed = jnp.any(keep & (jnp.arange(n) < i) & (iou[i] >= iou_threshold))
        return keep.at[i].set(v[i] & ~suppressed)

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.zeros(n, bool))
    return jnp.zeros(n, bool).at[order].set(keep_sorted)
