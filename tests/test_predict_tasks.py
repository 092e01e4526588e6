"""Predict-path outputs for segment/pose tasks (masks, keypoints)."""

import numpy as np
import pytest
import jax.numpy as jnp

from yolo_infer_tpu.core.model import YOLO11Model


@pytest.mark.parametrize("name,task", [("yolo11n-seg", "segment"), ("yolo11n-pose", "pose")])
def test_task_predict_outputs(name, task):
    m = YOLO11Model(name, compute_dtype=jnp.float32)
    img = np.random.default_rng(0).integers(0, 255, (96, 96, 3), dtype=np.uint8)
    res = m.predict(img, conf=0.0001, imgsz=64)[0]
    if not len(res):
        pytest.skip("random weights produced no detections at this threshold")
    if task == "segment":
        assert res.masks is not None
        assert res.masks.shape[0] == len(res)
        # serving masks are bilinearly upsampled to input resolution
        # (ultralytics process_mask(upsample=True) order) then letterbox-cropped
        assert res.masks.shape[1:] == (64, 64)  # square source: full imgsz
        assert (res.masks >= 0).all() and (res.masks <= 1).all()
    else:
        assert res.keypoints is not None
        assert res.keypoints.shape == (len(res), 17, 3)
        assert (res.keypoints[..., 2] >= 0).all() and (res.keypoints[..., 2] <= 1).all()


def test_assemble_masks_crop():
    from yolo_infer_tpu.core.predictor import _assemble_masks

    hm = wm = 16
    nm = 4
    proto = np.zeros((hm, wm, nm), np.float32)
    proto[..., 0] = 10.0  # channel 0 fires everywhere
    coefs = np.array([[1.0, 0, 0, 0]], np.float32)
    boxes = np.array([[8.0, 8.0, 32.0, 32.0]], np.float32)  # letterbox px, imgsz 64
    masks = _assemble_masks(proto, coefs, boxes, imgsz=64)
    assert masks.shape == (1, hm, wm)
    assert masks[0, 3, 3] > 0.99  # inside box (px 12..12 -> cell 3)
    assert masks[0, 12, 12] == 0.0  # outside crop


def test_mixed_sizes_single_compile():
    """Heterogeneous image sizes host-letterbox into ONE compiled signature
    (remote compiles cost 10-90 s each — per-shape compilation is unusable)."""
    m = YOLO11Model("yolo11n", compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (h, w, 3), dtype=np.uint8) for h, w in [(96, 128), (64, 64), (80, 100)]]
    res = m.predict(imgs, conf=0.0001, imgsz=64)
    assert len(res) == 3
    assert len(m.predictor._cache) == 1  # single (64, 64) signature
    for r, im in zip(res, imgs):
        assert r.orig_shape == tuple(im.shape[:2])
        if len(r):
            assert r.boxes[:, [0, 2]].max() <= im.shape[1] + 1e-3
            assert r.boxes[:, [1, 3]].max() <= im.shape[0] + 1e-3
