"""Validator end-to-end on a synthetic dataset (tiny shapes, CPU)."""

import numpy as np
import pytest
import yaml

from yolo_infer_tpu.core.validator import YOLO11Validator, create_validator


@pytest.fixture()
def synth_dataset(tmp_path):
    import cv2

    img_dir = tmp_path / "images" / "val"
    lbl_dir = tmp_path / "labels" / "val"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    for i in range(3):
        img = np.full((80, 80, 3), 90, np.uint8)
        cv2.rectangle(img, (10, 10), (40, 40), (255, 0, 0), -1)
        cv2.imwrite(str(img_dir / f"im{i}.jpg"), img)
        (lbl_dir / f"im{i}.txt").write_text("0 0.3125 0.3125 0.375 0.375\n")
    cfg = {"path": str(tmp_path), "val": "images/val", "names": {0: "thing"}, "nc": 1}
    p = tmp_path / "data.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return p


def test_validate_runs_end_to_end(synth_dataset, tmp_path):
    import jax.numpy as jnp

    from yolo_infer_tpu.core.model import YOLO11Model

    model = YOLO11Model("yolo11n", nc=80, compute_dtype=jnp.float32)
    v = YOLO11Validator(model=model, output_dir=tmp_path / "valout")
    out = v.validate(synth_dataset, imgsz=64, batch=2, conf=0.5, verbose=False)
    assert out["num_images"] == 3
    assert set(out["metrics"]) == {"mAP50-95", "mAP50", "mAP75", "precision", "recall"}
    assert (tmp_path / "valout" / "validation_summary.txt").exists()
    # random weights + conf 0.5 -> no detections -> zero mAP (not NaN/crash)
    assert out["metrics"]["mAP50-95"] == 0.0


def test_create_validator_factory():
    v = create_validator("yolo11n")
    assert isinstance(v, YOLO11Validator)
