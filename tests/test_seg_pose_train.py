"""Segment/pose label parsing, task batches, losses, and training e2e."""

import numpy as np
import pytest
import yaml
import jax
import jax.numpy as jnp

from yolo_infer_tpu.data.dataset import (
    YOLODataset,
    load_labels_keypoints,
    load_labels_segments,
    polygons_to_boxes,
    rasterize_instance_mask,
)
from yolo_infer_tpu.data.train_loader import TrainLoader


def _write_ds(root, task, n=4, kpt=3):
    import cv2

    img_dir = root / "images" / "train"
    lbl_dir = root / "labels" / "train"
    val_img = root / "images" / "val"
    val_lbl = root / "labels" / "val"
    for d in (img_dir, lbl_dir, val_img, val_lbl):
        d.mkdir(parents=True, exist_ok=True)
    for split_img, split_lbl in ((img_dir, lbl_dir), (val_img, val_lbl)):
        for i in range(n):
            img = np.full((64, 64, 3), 100, np.uint8)
            cv2.rectangle(img, (12, 12), (44, 52), (220, 40, 40), -1)
            cv2.imwrite(str(split_img / f"i{i}.jpg"), img)
            if task == "segment":
                # rectangle polygon for the drawn box
                (split_lbl / f"i{i}.txt").write_text(
                    "0 0.1875 0.1875 0.6875 0.1875 0.6875 0.8125 0.1875 0.8125\n"
                )
            else:  # pose
                kpts = "0.3 0.3 2 0.5 0.5 2 0.6 0.7 1"
                (split_lbl / f"i{i}.txt").write_text(f"0 0.4375 0.5 0.5 0.625 {kpts}\n")
    cfg = {"path": str(root), "train": "images/train", "val": "images/val", "names": {0: "t"}, "nc": 1}
    if task == "pose":
        cfg["kpt_shape"] = [kpt, 3]
    p = root / "data.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return p


def test_load_segment_labels(tmp_path):
    p = tmp_path / "l.txt"
    p.write_text("0 0.1 0.1 0.9 0.1 0.5 0.9\n1 0.2 0.2 0.3\nbad\n")
    cls, polys = load_labels_segments(p, nc=2)
    assert cls.tolist() == [0]
    assert polys[0].shape == (3, 2)
    boxes = polygons_to_boxes(polys, 100, 100)
    np.testing.assert_allclose(boxes[0], [10, 10, 90, 90], atol=0.5)


def test_load_keypoint_labels(tmp_path):
    p = tmp_path / "l.txt"
    p.write_text("0 0.5 0.5 0.4 0.4 0.3 0.3 2 0.5 0.5 1 0.7 0.7 0\n")
    cls, boxes, kpts = load_labels_keypoints(p, kpt_shape=(3, 3), nc=1)
    assert cls.tolist() == [0]
    assert kpts.shape == (1, 3, 3)
    assert kpts[0, 2, 2] == 0.0  # invisible kpt


def test_rasterize_instance_mask():
    polys = [np.array([[0.1, 0.1], [0.5, 0.1], [0.5, 0.5], [0.1, 0.5]], np.float32)]
    mask = rasterize_instance_mask(polys, (64, 64), scale=1.0, pad=(0, 0), out_hw=(64, 64), downsample=4)
    assert mask.shape == (16, 16)
    assert mask.max() == 1
    assert mask[3, 3] == 1 and mask[12, 12] == 0


@pytest.mark.parametrize("task", ["segment", "pose"])
def test_task_batches(tmp_path, task):
    data = _write_ds(tmp_path, task)
    ds = YOLODataset(data, split="train", task=task, kpt_shape=(3, 3))
    loader = TrainLoader(ds, batch_size=2, imgsz=64, max_boxes=4, seed=0)
    batch = next(iter(loader.epoch_batches(0)))
    assert batch["images"].shape == (2, 64, 64, 3)
    if task == "segment":
        assert batch["masks"].shape == (2, 16, 16)
        assert batch["masks"].max() >= 1
    else:
        assert batch["kpts"].shape == (2, 4, 3, 3)
        assert batch["mask"][:, 0].all()


def test_segmentation_loss_finite():
    from yolo_infer_tpu.core.losses import segmentation_loss
    from yolo_infer_tpu.models import build_model, forward

    params, state, spec = build_model(jax.random.PRNGKey(0), "segment", "n", nc=1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    out, _ = forward(params, state, spec, x, training=True, compute_dtype=jnp.float32)
    masks = np.zeros((2, 16, 16), np.int32)
    masks[:, 2:8, 2:8] = 1
    batch = {
        "boxes": jnp.asarray(np.tile([[8.0, 8.0, 32.0, 32.0]], (2, 4, 1)).astype(np.float32)),
        "classes": jnp.zeros((2, 4), jnp.int32),
        "mask": jnp.asarray(np.tile([True, False, False, False], (2, 1))),
        "masks": jnp.asarray(masks),
    }
    loss, metrics = segmentation_loss(out, batch, nc=1, mask_fg_cap=32)
    assert np.isfinite(float(loss))
    assert float(metrics["loss_mask"]) > 0


def test_pose_loss_finite_and_grads():
    from yolo_infer_tpu.core.losses import pose_loss
    from yolo_infer_tpu.models import build_model, forward

    params, state, spec = build_model(jax.random.PRNGKey(0), "pose", "n", nc=1, kpt_shape=(3, 3))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    out, _ = forward(params, state, spec, x, training=True, compute_dtype=jnp.float32)
    kpts = np.zeros((1, 4, 3, 3), np.float32)
    kpts[0, 0] = [[20, 20, 2], [30, 30, 2], [40, 44, 1]]
    batch = {
        "boxes": jnp.asarray(np.array([[[12.0, 12.0, 44.0, 52.0]] + [[0.0] * 4] * 3])),
        "classes": jnp.zeros((1, 4), jnp.int32),
        "mask": jnp.asarray([[True, False, False, False]]),
        "kpts": jnp.asarray(kpts),
    }
    loss, metrics = pose_loss(out, batch, nc=1)
    assert np.isfinite(float(loss))
    assert float(metrics["loss_kpt"]) >= 0 and float(metrics["loss_kobj"]) > 0


@pytest.mark.parametrize("task", ["segment", "pose"])
def test_task_training_end_to_end(tmp_path, task):
    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.core.trainer import TrainingConfig, YOLO11Trainer

    data = _write_ds(tmp_path, task)
    kw = {"kpt_shape": (3, 3)} if task == "pose" else {}
    model = YOLO11Model(f"yolo11n-{'seg' if task == 'segment' else 'pose'}", task=task, nc=1, compute_dtype=jnp.float32)
    if task == "pose":  # rebuild with tiny kpt head for the test
        from yolo_infer_tpu.models import build_model

        model.params, model.state, model.spec = build_model(jax.random.PRNGKey(0), "pose", "n", nc=1, kpt_shape=(3, 3))
        model.invalidate()
    cfg = TrainingConfig(
        data=str(data), epochs=1, batch=2, imgsz=64, max_boxes=4,
        val=False, project=str(tmp_path / "runs"), name=task, patience=0,
    )
    out = YOLO11Trainer(model=model, config=cfg).train()
    assert out["status"] == "completed"
    assert out["skipped_steps"] == 0
