"""DFL decode, anchor generation, dist2bbox."""

import jax.numpy as jnp
import numpy as np

from yolo_infer_tpu.ops.decode import decode_detections, dfl_expectation, dist2bbox, make_anchors
from yolo_infer_tpu.ops.iou import xywh2xyxy, xyxy2xywh


def test_dfl_expectation_one_hot():
    # a huge logit at bin k -> expectation ~= k
    logits = np.full((1, 4 * 16), -20.0, np.float32)
    for side, k in enumerate([0, 3, 7, 15]):
        logits[0, side * 16 + k] = 20.0
    out = np.asarray(dfl_expectation(jnp.asarray(logits)))
    np.testing.assert_allclose(out[0], [0, 3, 7, 15], atol=1e-4)


def test_dfl_expectation_uniform():
    logits = np.zeros((1, 64), np.float32)
    out = np.asarray(dfl_expectation(jnp.asarray(logits)))
    np.testing.assert_allclose(out[0], [7.5] * 4, atol=1e-5)


def test_make_anchors():
    pts, strides = make_anchors([(2, 2), (1, 1)], [8, 16])
    assert pts.shape == (5, 2)
    np.testing.assert_allclose(np.asarray(pts[0]), [0.5, 0.5])
    np.testing.assert_allclose(np.asarray(pts[1]), [1.5, 0.5])  # x varies fastest
    np.testing.assert_allclose(np.asarray(pts[4]), [0.5, 0.5])
    np.testing.assert_allclose(np.asarray(strides[:, 0]), [8, 8, 8, 8, 16])


def test_dist2bbox():
    dist = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    anchor = jnp.asarray([[10.0, 10.0]])
    xyxy = np.asarray(dist2bbox(dist, anchor))
    np.testing.assert_allclose(xyxy[0], [9, 8, 13, 14])


def test_decode_detections_shapes_and_range():
    nc, reg_max = 80, 16
    feats = [jnp.zeros((2, 8, 8, 4 * reg_max + nc)), jnp.zeros((2, 4, 4, 4 * reg_max + nc)), jnp.zeros((2, 2, 2, 4 * reg_max + nc))]
    boxes, scores = decode_detections(feats, nc, reg_max, (8, 16, 32))
    a = 64 + 16 + 4
    assert boxes.shape == (2, a, 4)
    assert scores.shape == (2, a, nc)
    np.testing.assert_allclose(np.asarray(scores), 0.5, atol=1e-6)  # sigmoid(0)
    # zero logits -> uniform DFL -> each side 7.5 cells * stride
    b0 = np.asarray(boxes[0, 0])
    np.testing.assert_allclose(b0, [(0.5 - 7.5) * 8, (0.5 - 7.5) * 8, (0.5 + 7.5) * 8, (0.5 + 7.5) * 8], atol=1e-3)


def test_xywh_roundtrip():
    rng = np.random.default_rng(0)
    xyxy = np.sort(rng.uniform(0, 100, (10, 4)).astype(np.float32), axis=-1)[:, [0, 1, 2, 3]]
    xyxy = np.concatenate([xyxy[:, :2], xyxy[:, :2] + rng.uniform(1, 50, (10, 2)).astype(np.float32)], -1)
    back = np.asarray(xywh2xyxy(xyxy2xywh(jnp.asarray(xyxy))))
    np.testing.assert_allclose(back, xyxy, atol=1e-4)
