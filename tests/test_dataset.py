"""YOLO-format dataset parsing + validation batching."""

import numpy as np
import pytest
import yaml

from yolo_infer_tpu.data.dataset import (
    YOLODataset,
    label_path_for,
    load_labels,
    parse_dataset_config,
    xywhn_to_xyxy,
)


@pytest.fixture()
def synth_dataset(tmp_path):
    """3 images with known boxes in YOLO layout + dataset yaml."""
    import cv2

    img_dir = tmp_path / "images" / "val"
    lbl_dir = tmp_path / "labels" / "val"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(3):
        h, w = 96 + 16 * i, 128
        img = np.full((h, w, 3), 60, np.uint8)
        # one box per image at a known place
        cv2.rectangle(img, (20, 10), (60, 50), (200, 30, 30), -1)
        cv2.imwrite(str(img_dir / f"im{i}.jpg"), img)
        cx, cy, bw, bh = 40 / w, 30 / h, 40 / w, 40 / h
        (lbl_dir / f"im{i}.txt").write_text(f"0 {cx} {cy} {bw} {bh}\n")
    cfg = {"path": str(tmp_path), "val": "images/val", "names": {0: "thing"}, "nc": 1}
    yaml_path = tmp_path / "data.yaml"
    yaml_path.write_text(yaml.safe_dump(cfg))
    return yaml_path


def test_parse_config(synth_dataset):
    cfg = parse_dataset_config(synth_dataset)
    assert cfg["nc"] == 1
    assert cfg["names"] == {0: "thing"}


def test_label_path_for():
    from pathlib import Path

    assert label_path_for(Path("/d/images/val/x.jpg")) == Path("/d/labels/val/x.txt")


def test_load_labels_filters_bad_lines(tmp_path):
    p = tmp_path / "l.txt"
    p.write_text("0 0.5 0.5 0.2 0.2\n1 1.5 0.5 0.2 0.2\nbadline\n5 0.5 0.5 0.1 0.1\n")
    cls, boxes = load_labels(p, nc=3)
    assert cls.tolist() == [0]  # out-of-range coord + bad class dropped
    assert boxes.shape == (1, 4)


def test_xywhn_to_xyxy():
    out = xywhn_to_xyxy(np.array([[0.5, 0.5, 0.5, 0.25]], np.float32), 200, 100)
    np.testing.assert_allclose(out[0], [50, 37.5, 150, 62.5])


def test_dataset_records(synth_dataset):
    ds = YOLODataset(synth_dataset, split="val")
    assert len(ds) == 3
    r = ds[0]
    assert r["image"].shape == (96, 128, 3)
    np.testing.assert_allclose(r["boxes"][0], [20, 10, 60, 50], atol=0.5)
    assert r["classes"].tolist() == [0]


def test_val_batches_padded(synth_dataset):
    ds = YOLODataset(synth_dataset, split="val")
    batches = list(ds.iter_val_batches(batch_size=2, imgsz=64))
    assert len(batches) == 2
    assert batches[0]["images"].shape == (2, 64, 64, 3)
    assert batches[1]["images"].shape == (2, 64, 64, 3)  # padded to static shape
    assert batches[1]["n"] == 1
