"""OBB training: labels, rbox conversion, loss, trainer e2e, validation."""

import numpy as np
import pytest
import yaml
import jax
import jax.numpy as jnp

from yolo_infer_tpu.data.dataset import YOLODataset, corners_to_rbox, load_labels_obb


@pytest.fixture(scope="module")
def obb_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("obb")
    for split in ("train", "val"):
        img_dir = root / "images" / split
        lbl_dir = root / "labels" / split
        img_dir.mkdir(parents=True)
        lbl_dir.mkdir(parents=True)
        for i in range(4):
            img = np.full((64, 64, 3), 100, np.uint8)
            pts = np.array([[14, 20], [44, 12], [50, 34], [20, 42]], np.int32)
            cv2.fillPoly(img, [pts], (220, 40, 40))
            cv2.imwrite(str(img_dir / f"i{i}.jpg"), img)
            corners = " ".join(f"{x/64:.4f} {y/64:.4f}" for x, y in pts)
            (lbl_dir / f"i{i}.txt").write_text(f"0 {corners}\n")
    p = root / "data.yaml"
    p.write_text(yaml.safe_dump({"path": str(root), "train": "images/train", "val": "images/val", "names": {0: "t"}, "nc": 1}))
    return p


def test_load_obb_labels(tmp_path):
    p = tmp_path / "l.txt"
    p.write_text("0 0.1 0.1 0.9 0.1 0.9 0.5 0.1 0.5\n1 0.1 0.1 0.2\n")
    cls, corners = load_labels_obb(p, nc=2)
    assert cls.tolist() == [0]
    assert corners.shape == (1, 4, 2)


def test_corners_to_rbox_axis_aligned():
    corners = np.array([[[10, 20], [50, 20], [50, 40], [10, 40]]], np.float32)
    rb = corners_to_rbox(corners)
    np.testing.assert_allclose(rb[0, :2], [30, 30], atol=0.6)
    np.testing.assert_allclose(sorted(rb[0, 2:4]), [20, 40], atol=0.6)
    assert -np.pi / 4 <= rb[0, 4] < 3 * np.pi / 4


def test_obb_dataset_and_batch(obb_dataset):
    from yolo_infer_tpu.data.train_loader import TrainLoader

    ds = YOLODataset(obb_dataset, split="train", task="obb")
    r = ds[0]
    assert r["rboxes"].shape == (1, 5)
    loader = TrainLoader(ds, batch_size=2, imgsz=64, max_boxes=4, seed=0)
    batch = next(iter(loader.epoch_batches(0)))
    assert batch["boxes"].shape == (2, 4, 5)  # rotated boxes
    assert batch["mask"][:, 0].all()


def test_obb_loss_finite_and_grads():
    from yolo_infer_tpu.core.losses import obb_loss
    from yolo_infer_tpu.models import build_model, forward

    params, state, spec = build_model(jax.random.PRNGKey(0), "obb", "n", nc=1)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    out, _ = forward(params, state, spec, x, training=True, compute_dtype=jnp.float32)
    rb = np.zeros((1, 4, 5), np.float32)
    rb[0, 0] = [32, 28, 30, 16, 0.3]
    batch = {
        "boxes": jnp.asarray(rb),
        "classes": jnp.zeros((1, 4), jnp.int32),
        "mask": jnp.asarray([[True, False, False, False]]),
    }
    loss, metrics = obb_loss(out, batch, nc=1)
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert int(metrics["num_fg"]) > 0


def test_obb_training_end_to_end(obb_dataset, tmp_path):
    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.core.trainer import TrainingConfig, YOLO11Trainer

    model = YOLO11Model("yolo11n-obb", nc=1, compute_dtype=jnp.float32)
    cfg = TrainingConfig(
        data=str(obb_dataset), epochs=1, batch=2, imgsz=64, max_boxes=4,
        val=False, project=str(tmp_path / "runs"), name="obb", patience=0,
    )
    out = YOLO11Trainer(model=model, config=cfg).train()
    assert out["status"] == "completed"
    assert out["skipped_steps"] == 0


def test_obb_validation_runs(obb_dataset, tmp_path):
    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.core.validator import YOLO11Validator

    model = YOLO11Model("yolo11n-obb", nc=1, compute_dtype=jnp.float32)
    v = YOLO11Validator(model=model, output_dir=tmp_path / "out")
    out = v.validate(obb_dataset, imgsz=64, batch=2, conf=0.5, verbose=False)
    assert out["num_images"] == 4
