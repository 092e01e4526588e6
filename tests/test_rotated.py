"""Oriented boxes: decode, probIoU, rotated NMS, OBB predict path."""

import numpy as np
import pytest
import jax.numpy as jnp

from yolo_infer_tpu.ops.decode import dist2bbox
from yolo_infer_tpu.ops.rotated import batched_rotated_nms, dist2rbox, probiou_matrix


def test_dist2rbox_zero_angle_matches_xywh():
    dist = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    anchor = jnp.asarray([[10.0, 10.0]])
    rb = np.asarray(dist2rbox(dist, jnp.zeros((1,)), anchor))
    xyxy = np.asarray(dist2bbox(dist, anchor))
    cx, cy = (xyxy[0, 0] + xyxy[0, 2]) / 2, (xyxy[0, 1] + xyxy[0, 3]) / 2
    np.testing.assert_allclose(rb[0], [cx, cy, 4.0, 6.0], atol=1e-5)


def test_probiou_identity_and_disjoint():
    a = jnp.asarray([[50.0, 50.0, 20.0, 10.0, 0.3]])
    b = jnp.asarray([[50.0, 50.0, 20.0, 10.0, 0.3], [500.0, 500.0, 20.0, 10.0, 0.3]])
    m = np.asarray(probiou_matrix(a, b))
    assert m[0, 0] > 0.95
    assert m[0, 1] < 0.05


def test_probiou_rotation_sensitivity():
    a = jnp.asarray([[50.0, 50.0, 40.0, 8.0, 0.0]])
    b = jnp.asarray([[50.0, 50.0, 40.0, 8.0, 0.0], [50.0, 50.0, 40.0, 8.0, float(np.pi / 2)]])
    m = np.asarray(probiou_matrix(a, b))
    assert m[0, 0] > m[0, 1] + 0.3  # perpendicular elongated boxes overlap much less


def test_rotated_nms_suppression_and_classes():
    rboxes = np.array(
        [
            [50, 50, 40, 10, 0.2],
            [51, 50, 40, 10, 0.22],  # near-duplicate -> suppressed
            [50, 50, 40, 10, 0.2],  # same box, other class -> kept
            [300, 300, 30, 30, 1.0],
        ],
        np.float32,
    )
    scores = np.zeros((4, 3), np.float32)
    scores[0, 0] = 0.9
    scores[1, 0] = 0.8
    scores[2, 1] = 0.7
    scores[3, 2] = 0.6
    out = batched_rotated_nms(jnp.asarray(rboxes[None]), jnp.asarray(scores[None]), 0.25, 0.45, pre_topk=8, max_det=8)
    assert int(out["num"][0]) == 3
    kept = sorted(np.asarray(out["scores"][0, :3]).astype(np.float64).round(2).tolist(), reverse=True)
    assert kept == [0.9, 0.7, 0.6]


def test_rotated_nms_multi_label():
    """multi_label=True (the ultralytics OBB val protocol) emits one candidate
    per (anchor, class) above conf: an anchor scoring two classes yields two
    detections, kept apart by class-aware suppression."""
    rboxes = np.array(
        [
            [50, 50, 40, 10, 0.2],
            [300, 300, 30, 30, 1.0],
        ],
        np.float32,
    )
    scores = np.zeros((2, 3), np.float32)
    scores[0, 0] = 0.9
    scores[0, 1] = 0.6  # same anchor, second class above conf
    scores[1, 2] = 0.7
    single = batched_rotated_nms(jnp.asarray(rboxes[None]), jnp.asarray(scores[None]), 0.25, 0.45,
                                 pre_topk=8, max_det=8)
    multi = batched_rotated_nms(jnp.asarray(rboxes[None]), jnp.asarray(scores[None]), 0.25, 0.45,
                                pre_topk=8, max_det=8, multi_label=True)
    assert int(single["num"][0]) == 2  # argmax class only
    assert int(multi["num"][0]) == 3
    sc = np.asarray(multi["scores"][0]).astype(np.float64).round(2)
    assert sorted(sc[:3].tolist(), reverse=True) == [0.9, 0.7, 0.6]
    # the two detections of anchor 0 carry distinct classes
    cls0 = sorted(int(c) for c, s in zip(np.asarray(multi["classes"][0]), sc) if s in (0.9, 0.6))
    assert cls0 == [0, 1]


def test_obb_model_predict():
    from yolo_infer_tpu.core.model import YOLO11Model

    m = YOLO11Model("yolo11n-obb", compute_dtype=jnp.float32)
    img = np.random.default_rng(0).integers(0, 255, (96, 96, 3), dtype=np.uint8)
    res = m.predict(img, conf=0.0001, imgsz=64)[0]
    if len(res):
        assert res.obb is not None and res.obb.shape[1] == 5
        assert res.boxes.shape[1] == 4  # axis-aligned envelopes
        assert (res.obb[:, 4] >= -np.pi / 4 - 1e-3).all() and (res.obb[:, 4] <= 3 * np.pi / 4 + 1e-3).all()


def test_obb_converter_parity(tmp_path):
    import torch

    from torch_ref import TorchYOLO11
    from yolo_infer_tpu.models import build_spec, forward
    from yolo_infer_tpu.models.convert import convert_pt_checkpoint

    torch.manual_seed(3)
    spec = build_spec("obb", "n", nc=15)
    tmodel = TorchYOLO11(spec).eval()
    path = tmp_path / "obb.pt"
    torch.save({"model": tmodel}, path)
    params, meta = convert_pt_checkpoint(path)
    assert meta["task"] == "obb" and meta["nc"] == 15
    x = np.random.default_rng(3).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    ref, extras_t = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out, _ = forward(params, meta["state"], spec, jnp.asarray(x), compute_dtype=jnp.float32)
    for t_lvl, j_lvl in zip(extras_t["angle"], out["angle"]):
        np.testing.assert_allclose(t_lvl.detach().numpy().transpose(0, 2, 3, 1), np.asarray(j_lvl), atol=2e-4, rtol=1e-3)
    for t_lvl, j_lvl in zip(ref, out["feats"]):
        np.testing.assert_allclose(t_lvl.numpy().transpose(0, 2, 3, 1), np.asarray(j_lvl), atol=2e-4, rtol=1e-3)
