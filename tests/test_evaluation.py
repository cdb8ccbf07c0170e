"""mAP evaluation harness tests with analytically known outcomes."""

import numpy as np

from async_ev_cnn_tpu.utils.evaluation import (
    average_precision,
    decode_predictions,
    evaluate_detections,
    iou_matrix,
)


def test_iou_matrix_known_values():
    a = np.array([[10, 10, 10, 10]], np.float32)        # 5..15 square
    b = np.array([[10, 10, 10, 10], [15, 15, 10, 10],   # identical; half-offset
                  [40, 40, 4, 4]], np.float32)          # disjoint
    m = iou_matrix(a, b)
    assert np.isclose(m[0, 0], 1.0)
    assert np.isclose(m[0, 1], 25 / 175)  # 5x5 overlap / (100+100-25)
    assert m[0, 2] == 0.0


def test_perfect_predictions_map_1():
    gts = [(np.array([[10, 10, 8, 8], [30, 30, 6, 6]], np.float32),
            np.array([0, 1]))]
    preds = [(np.array([[10, 10, 8, 8], [30, 30, 6, 6]], np.float32),
              np.array([0.9, 0.8], np.float32), np.array([0, 1]))]
    res = evaluate_detections(preds, gts, num_classes=2)
    assert np.isclose(res["mAP"], 1.0)


def test_wrong_class_scores_zero():
    gts = [(np.array([[10, 10, 8, 8]], np.float32), np.array([0]))]
    preds = [(np.array([[10, 10, 8, 8]], np.float32),
              np.array([0.9], np.float32), np.array([1]))]
    res = evaluate_detections(preds, gts, num_classes=2)
    assert res["ap_per_class"][0] == 0.0
    assert np.isnan(res["ap_per_class"][1])  # no class-1 ground truth
    assert res["mAP"] == 0.0


def test_duplicate_detection_counts_once():
    # two predictions on one gt: the higher-score one is TP, the other FP
    gts = [(np.array([[10, 10, 8, 8]], np.float32), np.array([0]))]
    preds = [(np.array([[10, 10, 8, 8], [10.5, 10, 8, 8]], np.float32),
              np.array([0.9, 0.8], np.float32), np.array([0, 0]))]
    res = evaluate_detections(preds, gts, num_classes=1)
    # AP = area under PR with points (r=1, p=1), (r=1, p=0.5) -> 1.0
    assert np.isclose(res["ap_per_class"][0], 1.0)


def test_half_recall():
    gts = [(np.array([[10, 10, 8, 8], [40, 40, 8, 8]], np.float32),
            np.array([0, 0]))]
    preds = [(np.array([[10, 10, 8, 8]], np.float32),
              np.array([0.9], np.float32), np.array([0]))]
    res = evaluate_detections(preds, gts, num_classes=1)
    assert np.isclose(res["ap_per_class"][0], 0.5)


def test_average_precision_monotone_envelope():
    r = np.array([0.5, 1.0])
    p = np.array([1.0, 0.5])
    assert np.isclose(average_precision(r, p), 0.75)


def test_decode_predictions_pipeline():
    num_classes, num_bbox = 3, 2
    grid = np.zeros((4, 4, num_classes + num_bbox * 5), np.float32)
    grid[2, 1, :3] = [0.05, 0.9, 0.05]
    grid[2, 1, 3:8] = [0.5, 0.5, 0.5, 0.5, 0.95]   # strong box
    grid[2, 1, 8:13] = [0.5, 0.5, 0.5, 0.5, 0.90]  # duplicate -> NMS'd away
    boxes, scores, classes = decode_predictions(grid, num_classes, num_bbox, 80, 80)
    assert len(boxes) == 1
    assert classes[0] == 1
    assert np.isclose(boxes[0][0], (0.5 + 1) / 4 * 80)
    # the detection score is the CLASS score (prob * conf), not the raw
    # class-agnostic objectness — the quantity per-class AP must rank by
    assert np.isclose(scores[0], 0.9 * 0.95)


def test_decode_predictions_per_class_nms():
    """NMS runs per class: overlapping confident detections of DIFFERENT
    classes both survive (class-agnostic NMS used to suppress one)."""
    num_classes, num_bbox = 2, 2
    grid = np.zeros((2, 2, num_classes + num_bbox * 5), np.float32)
    grid[0, 0, :2] = [0.6, 0.4]  # both classes over threshold
    grid[0, 0, 2:7] = [0.5, 0.5, 0.5, 0.5, 0.95]
    boxes, scores, classes = decode_predictions(
        grid, num_classes, num_bbox, 80, 80, conf_threshold=0.3)
    assert sorted(classes.tolist()) == [0, 1]


def test_nms_accepts_int_mask_and_matches_jax_ties(rng):
    """(a) a 0/1 int validity mask must behave as a boolean mask, not
    fancy-index; (b) host nms and device nms_jax break score ties the
    same way."""
    import jax.numpy as jnp

    from async_ev_cnn_tpu.utils.nms import nms, nms_jax

    boxes = np.array([[10, 10, 4, 4], [30, 30, 4, 4], [50, 50, 4, 4]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    np.testing.assert_array_equal(
        nms(boxes, scores, valid=np.array([1, 1, 0])),
        nms(boxes, scores, valid=np.array([True, True, False])))
    # tied identical boxes: both paths must pick the same representative
    tb = np.array([[10, 10, 4, 4], [10, 10, 4, 4], [40, 40, 4, 4]],
                  np.float32)
    tsc = np.array([0.9, 0.9, 0.5], np.float32)
    picked = nms(tb, tsc)
    keep = np.asarray(nms_jax(jnp.asarray(tb), jnp.asarray(tsc),
                              jnp.ones(3, bool)))
    np.testing.assert_array_equal(np.sort(picked), np.where(keep)[0])
