"""Classification task: dataset, loader, training e2e, evaluation."""

import numpy as np
import pytest
import jax.numpy as jnp

from yolo_infer_tpu.data.classify import ClassifyDataset, ClassifyLoader, evaluate_classifier


@pytest.fixture(scope="module")
def cls_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("cls")
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for ci, color in enumerate([(255, 0, 0), (0, 0, 255)]):
            d = root / split / f"class{ci}"
            d.mkdir(parents=True)
            for i in range(4):
                img = np.zeros((72, 80, 3), np.uint8)
                img[:, :] = color
                noise = rng.integers(0, 40, img.shape, dtype=np.uint8)
                cv2.imwrite(str(d / f"{i}.jpg"), img + noise)
    return root


def test_dataset_and_loader(cls_dataset):
    ds = ClassifyDataset(cls_dataset, split="train")
    assert ds.nc == 2 and len(ds) == 8
    assert ds.names == {0: "class0", 1: "class1"}
    loader = ClassifyLoader(ds, batch_size=4, imgsz=64)
    batches = list(loader.epoch_batches(0))
    assert len(batches) == 2
    assert batches[0]["images"].shape == (4, 64, 64, 3)
    assert batches[0]["labels"].shape == (4,)


def test_classify_training_end_to_end(cls_dataset, tmp_path):
    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.core.trainer import TrainingConfig, YOLO11Trainer

    model = YOLO11Model("yolo11n-cls", nc=2, compute_dtype=jnp.float32)
    cfg = TrainingConfig(
        data=str(cls_dataset), epochs=2, batch=4, imgsz=64,
        project=str(tmp_path / "runs"), name="cls", patience=0, val=True,
    )
    out = YOLO11Trainer(model=model, config=cfg).train()
    assert out["status"] == "completed"
    assert out["epochs_completed"] == 2
    assert "val_top1" in out["history"][-1]


def test_evaluate_classifier(cls_dataset):
    from yolo_infer_tpu.core.model import YOLO11Model

    model = YOLO11Model("yolo11n-cls", nc=2, compute_dtype=jnp.float32)
    ds = ClassifyDataset(cls_dataset, split="val")
    out = evaluate_classifier(model, ds, imgsz=64, batch=4)
    assert out["num_images"] == 8
    assert 0.0 <= out["top1"] <= 1.0
    assert out["top5"] == 1.0  # nc=2 < 5: top-5 always hits
