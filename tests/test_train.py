"""Training: augmentation, loader, train step, trainer e2e, robustness."""

import dataclasses
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from yolo_infer_tpu.core.train_step import TrainState, init_train_state, make_optimizer, make_train_step
from yolo_infer_tpu.data.augment import DEFAULT_AUG, augment_sample, mosaic4
from yolo_infer_tpu.data.train_loader import TrainLoader, pad_labels


@pytest.fixture(scope="module")
def synth_train_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("ds")
    for split in ("train", "val"):
        img_dir = root / "images" / split
        lbl_dir = root / "labels" / split
        img_dir.mkdir(parents=True)
        lbl_dir.mkdir(parents=True)
        rng = np.random.default_rng(0)
        for i in range(6):
            img = np.full((64, 64, 3), 90, np.uint8)
            cv2.rectangle(img, (8, 8), (40, 48), (255, 40, 40), -1)
            cv2.imwrite(str(img_dir / f"im{i}.jpg"), img)
            (lbl_dir / f"im{i}.txt").write_text("0 0.375 0.4375 0.5 0.625\n")
    p = root / "data.yaml"
    p.write_text(yaml.safe_dump({"path": str(root), "train": "images/train", "val": "images/val", "names": {0: "box"}, "nc": 1}))
    return p


def test_pad_labels():
    b, c, m = pad_labels(np.ones((3, 4), np.float32), np.ones(3, np.int32), 8)
    assert b.shape == (8, 4) and m.sum() == 3 and c[:3].tolist() == [1, 1, 1]
    b, c, m = pad_labels(np.ones((10, 4), np.float32), np.ones(10, np.int32), 4)
    assert m.sum() == 4  # truncated


def test_augment_sample_flip_boxes():
    rng = random.Random(0)
    rec = {
        "image": np.zeros((64, 64, 3), np.uint8),
        "boxes": np.array([[0, 0, 10, 10]], np.float32),
        "classes": np.array([0], np.int32),
    }
    hyp = {**DEFAULT_AUG, "fliplr": 1.0, "hsv_h": 0, "hsv_s": 0, "hsv_v": 0, "mosaic": 0}
    img, boxes, cls = augment_sample([rec], rng, imgsz=64, hyp=hyp, use_mosaic=False)
    assert img.shape == (64, 64, 3)
    np.testing.assert_allclose(boxes[0], [54, 0, 64, 10], atol=1.0)


def test_mosaic4_combines_boxes():
    rng = random.Random(1)
    recs = [
        {
            "image": np.full((32, 32, 3), 50 * (i + 1), np.uint8),
            "boxes": np.array([[4, 4, 20, 20]], np.float32),
            "classes": np.array([i], np.int32),
        }
        for i in range(4)
    ]
    canvas, boxes, cls = mosaic4(recs, rng, imgsz=32)
    assert canvas.shape == (64, 64, 3)
    assert len(boxes) <= 4 and len(boxes) == len(cls)


def test_train_loader_shapes(synth_train_dataset):
    from yolo_infer_tpu.data.dataset import YOLODataset

    ds = YOLODataset(synth_train_dataset, split="train")
    loader = TrainLoader(ds, batch_size=2, imgsz=64, max_boxes=8, seed=0)
    batches = list(loader.epoch_batches(0))
    assert len(batches) == 3
    b = batches[0]
    assert b["images"].shape == (2, 64, 64, 3)
    assert b["images"].dtype == np.uint8  # normalized in-graph by the train step
    assert b["boxes"].shape == (2, 8, 4)
    assert b["mask"].dtype == bool


def test_train_step_decreases_loss():
    ts = init_train_state(jax.random.PRNGKey(0), "detect", "n", imgsz=64, lr=0.01, total_steps=30, warmup_steps=1)
    step = make_train_step(ts.spec, ts.tx)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    batch = {
        "images": jnp.asarray(img),
        "boxes": jnp.asarray(np.tile(np.array([[8, 8, 40, 48]], np.float32), (2, 4, 1))),
        "classes": jnp.zeros((2, 4), jnp.int32),
        "mask": jnp.asarray(np.tile(np.array([True, False, False, False]), (2, 1))),
    }
    losses = []
    for _ in range(8):
        ts, metrics = step(ts, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(np.asarray(ts.skipped)) == 0
    assert int(np.asarray(ts.step)) == 8


def test_train_step_skips_nonfinite():
    ts = init_train_state(jax.random.PRNGKey(0), "detect", "n", imgsz=64, lr=0.01, total_steps=10, warmup_steps=1)
    step = make_train_step(ts.spec, ts.tx)
    bad = {
        "images": jnp.full((1, 64, 64, 3), jnp.nan, jnp.float32),
        "boxes": jnp.zeros((1, 4, 4), jnp.float32),
        "classes": jnp.zeros((1, 4), jnp.int32),
        "mask": jnp.zeros((1, 4), bool),
    }
    params_before = np.asarray(jax.tree_util.tree_leaves(ts.params)[0])  # copy before donation
    ts, metrics = step(ts, bad)
    assert int(np.asarray(metrics["step_skipped"])) == 1
    assert int(np.asarray(ts.skipped)) == 1
    np.testing.assert_array_equal(params_before, np.asarray(jax.tree_util.tree_leaves(ts.params)[0]))


def test_freeze_zeroes_updates():
    ts = init_train_state(jax.random.PRNGKey(0), "detect", "n", imgsz=64)
    tx = make_optimizer(0.01, total_steps=10, warmup_steps=1, freeze=lambda k: k == "0")
    grads = jax.tree_util.tree_map(jnp.ones_like, ts.params)
    state = tx.init(ts.params)
    updates, state = tx.update(grads, state, ts.params)  # step 0: warmup lr=0
    updates, state = tx.update(grads, state, ts.params)  # step 1: lr > 0
    assert float(jnp.abs(updates["0"]["w"]).max()) == 0.0
    assert float(jnp.abs(updates["1"]["w"]).max()) > 0.0


def test_trainer_end_to_end(synth_train_dataset, tmp_path):
    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.core.trainer import TrainingConfig, YOLO11Trainer

    model = YOLO11Model("yolo11n", nc=1, compute_dtype=jnp.float32)
    cfg = TrainingConfig(
        data=str(synth_train_dataset), epochs=1, batch=2, imgsz=64, max_boxes=8,
        val=False, mosaic=0.0, project=str(tmp_path / "runs"), name="t", patience=0,
    )
    out = YOLO11Trainer(model=model, config=cfg).train()
    assert out["status"] == "completed"
    assert out["epochs_completed"] == 1
    run = tmp_path / "runs" / "t"
    assert (run / "training_summary.txt").exists()
    assert (run / "config.json").exists()
    assert list((run / "checkpoints").glob("checkpoint_epoch_*.msgpack"))


def test_robust_trainer_swallows_errors(tmp_path):
    from yolo_infer_tpu.core.robust_trainer import RobustYOLO11Trainer, classify_training_error
    from yolo_infer_tpu.core.trainer import TrainingConfig

    cfg = TrainingConfig(data="/nonexistent/data.yaml", epochs=1, project=str(tmp_path), name="r")
    out = RobustYOLO11Trainer(model_path="yolo11n", config=cfg, skip_errors=True).train()
    assert out["status"] == "failed" and out["error_skipped"]
    assert classify_training_error(ValueError("shape mismatch 3x4 vs 4x4")) == "shape_mismatch"
    assert classify_training_error(RuntimeError("RESOURCE EXHAUSTED: oom")) == "out_of_memory"


def test_training_config_roundtrip(tmp_path):
    from yolo_infer_tpu.core.trainer import TrainingConfig

    cfg = TrainingConfig(data="d.yaml", epochs=7, lr0=0.02)
    p = tmp_path / "cfg.json"
    cfg.save(p)
    cfg2 = TrainingConfig.load(p)
    assert cfg2 == cfg
