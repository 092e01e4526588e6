"""mAP engine: matching, AP integration, end-to-end metric values."""

import numpy as np

from yolo_infer_tpu.core.metrics import DetMetrics, box_iou_np, compute_ap, match_predictions


def test_box_iou_np():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], np.float32)
    iou = box_iou_np(a, b)[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-5)


def test_match_predictions_greedy():
    gt = np.array([[0, 0, 10, 10]], np.float32)
    gt_cls = np.array([0])
    preds = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32)  # both overlap the single gt
    pred_cls = np.array([0, 0])
    tp = match_predictions(preds, pred_cls, gt, gt_cls)
    assert tp[0, 0] and not tp[1, 0]  # only the first (higher-conf) claims it


def test_match_respects_class():
    gt = np.array([[0, 0, 10, 10]], np.float32)
    tp = match_predictions(np.array([[0, 0, 10, 10]], np.float32), np.array([1]), gt, np.array([0]))
    assert not tp.any()


def test_compute_ap_perfect():
    assert compute_ap(np.array([1.0]), np.array([1.0])) > 0.99


def test_perfect_predictions_map1():
    m = DetMetrics(nc=3)
    rng = np.random.default_rng(0)
    for _ in range(5):
        n = 4
        boxes = np.sort(rng.uniform(0, 300, (n, 2)), axis=-1)
        boxes = np.concatenate([boxes, boxes + rng.uniform(20, 80, (n, 2))], axis=-1).astype(np.float32)
        cls = rng.integers(0, 3, n)
        m.update(boxes, np.full(n, 0.9, np.float32), cls, boxes, cls)
    r = m.compute()
    assert r["map"] > 0.99 and r["map50"] > 0.99
    assert r["precision"] > 0.99 and r["recall"] > 0.99


def test_half_detected():
    m = DetMetrics(nc=1)
    gt = np.array([[0, 0, 10, 10], [100, 100, 120, 130]], np.float32)
    gt_cls = np.array([0, 0])
    # only first gt detected, plus no FPs
    m.update(gt[:1], np.array([0.9], np.float32), np.array([0]), gt, gt_cls)
    r = m.compute()
    assert abs(r["recall"] - 0.5) < 1e-6
    assert abs(r["precision"] - 1.0) < 1e-6
    # ultralytics 'interp' AP: envelope 1.0 on [0, 0.5], then linear to the
    # (1, 0) sentinel -> trapezoid area 0.75 (cross-checked vs the brute-force
    # oracle in tests/test_ap_oracle.py::test_oracle_half_detected; the strict
    # COCO step-sampled value would be 51/101)
    assert 0.74 < r["map50"] < 0.76


def test_localization_quality_affects_map5095():
    m_tight = DetMetrics(nc=1)
    m_loose = DetMetrics(nc=1)
    gt = np.array([[0, 0, 100, 100]], np.float32)
    cls = np.array([0])
    m_tight.update(gt, np.array([0.9], np.float32), cls, gt, cls)
    # IoU = 0.68 box: passes 0.5/0.55/0.6/0.65 but not 0.7+
    loose = np.array([[0, 0, 100, 68]], np.float32)
    m_loose.update(loose, np.array([0.9], np.float32), cls, gt, cls)
    rt, rl = m_tight.compute(), m_loose.compute()
    assert rt["map"] > 0.99
    assert rl["map50"] > 0.99
    assert rl["map"] < 0.5  # high-IoU thresholds fail


def test_empty_inputs():
    m = DetMetrics(nc=2)
    m.update(np.zeros((0, 4), np.float32), np.zeros(0, np.float32), np.zeros(0), np.zeros((0, 4), np.float32), np.zeros(0))
    r = m.compute()
    assert r["map"] == 0.0
