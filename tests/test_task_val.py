"""Mask-mAP / OKS pose-mAP metrics + segment/pose validation end-to-end."""

import numpy as np
import pytest
import yaml
import jax.numpy as jnp

from yolo_infer_tpu.core.metrics import DetMetrics, mask_iou_matrix, oks_matrix


def test_mask_iou_matrix():
    a = np.zeros((1, 8, 8), bool)
    a[0, :4, :4] = True
    b = np.zeros((2, 8, 8), bool)
    b[0, :4, :4] = True
    b[1, 2:6, 2:6] = True
    iou = mask_iou_matrix(a, b)
    assert iou[0, 0] == 1.0
    np.testing.assert_allclose(iou[0, 1], 4 / 28, atol=1e-6)


def test_oks_matrix_perfect_and_offset():
    k = 3
    gt = np.zeros((1, k, 3), np.float32)
    gt[0, :, :2] = [[10, 10], [20, 20], [30, 30]]
    gt[0, :, 2] = 2
    pred_same = gt[:, :, :2].copy()[None][0][None]  # (1, K, 2)
    areas = np.array([400.0], np.float32)
    m = oks_matrix(gt[:, :, :2], gt, areas)
    assert m[0, 0] > 0.99
    far = gt[:, :, :2] + 100
    m2 = oks_matrix(far, gt, areas)
    assert m2[0, 0] < 0.01


def test_update_from_iou_perfect_map():
    dm = DetMetrics(nc=1)
    iou = np.array([[1.0]], np.float32)
    dm.update_from_iou(iou, np.array([0.9], np.float32), np.array([0]), np.array([0]))
    r = dm.compute()
    assert r["map"] > 0.99


@pytest.mark.parametrize("task,suffix", [("segment", "seg"), ("pose", "pose")])
def test_task_validation_end_to_end(tmp_path, task, suffix):
    import cv2

    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.core.validator import YOLO11Validator

    img_dir = tmp_path / "images" / "val"
    lbl_dir = tmp_path / "labels" / "val"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    for i in range(2):
        img = np.full((64, 64, 3), 100, np.uint8)
        cv2.rectangle(img, (12, 12), (44, 52), (220, 40, 40), -1)
        cv2.imwrite(str(img_dir / f"i{i}.jpg"), img)
        if task == "segment":
            (lbl_dir / f"i{i}.txt").write_text("0 0.1875 0.1875 0.6875 0.1875 0.6875 0.8125 0.1875 0.8125\n")
        else:
            (lbl_dir / f"i{i}.txt").write_text("0 0.4375 0.5 0.5 0.625 0.3 0.3 2 " + "0.5 0.5 2 " * 16 + "\n")
    cfg = {"path": str(tmp_path), "val": "images/val", "names": {0: "t"}, "nc": 1}
    data = tmp_path / "d.yaml"
    data.write_text(yaml.safe_dump(cfg))

    model = YOLO11Model(f"yolo11n-{suffix}", nc=1, compute_dtype=jnp.float32)
    v = YOLO11Validator(model=model, output_dir=tmp_path / "out")
    out = v.validate(data, imgsz=64, batch=2, conf=0.5, verbose=False)
    key = "mask_metrics" if task == "segment" else "pose_metrics"
    assert key in out
    assert set(out[key]) == {"mAP50-95", "mAP50", "mAP75"}
    assert out["num_images"] == 2
