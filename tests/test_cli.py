"""CLI + demo + dataset validator + visualization, driven end-to-end (CPU, tiny)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root for main.py

from main import YOLO11CLI  # noqa: E402


@pytest.fixture(scope="module")
def demo_image(tmp_path_factory):
    import cv2

    p = tmp_path_factory.mktemp("img") / "in.jpg"
    img = np.full((96, 128, 3), 80, np.uint8)
    cv2.rectangle(img, (20, 20), (70, 70), (0, 0, 255), -1)
    cv2.imwrite(str(p), img)
    return p


def test_cli_info(capsys):
    rc = YOLO11CLI().run(["info"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert "devices" in out and out["dependencies"]["jax"]


def test_cli_demo_image(demo_image, tmp_path, capsys):
    out_path = tmp_path / "out.jpg"
    rc = YOLO11CLI().run(["demo", "--input", str(demo_image), "--output", str(out_path), "--imgsz", "64", "--conf", "0.5"])
    assert rc == 0
    assert out_path.exists()
    data = json.loads(capsys.readouterr().out)
    assert "num_detections" in data and "inference_time_s" in data


def test_cli_unknown_input_exit_code(tmp_path):
    rc = YOLO11CLI().run(["demo", "--input", str(tmp_path / "missing.jpg")])
    assert rc != 0


def test_cli_config_merging(tmp_path, demo_image, capsys):
    cfg = {"inference": {"imgsz": 64}, "demo": {"conf_threshold": 0.9}}
    cfg_path = tmp_path / "c.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    rc = YOLO11CLI().run(["--config", str(cfg_path), "demo", "--input", str(demo_image)])
    assert rc == 0  # config-file imgsz threaded into the demo (no --imgsz flag)


def test_dataset_validator(tmp_path):
    from yolo_infer_tpu.data.dataset_validator import DatasetValidator

    lbl = tmp_path / "labels"
    lbl.mkdir()
    (lbl / "good.txt").write_text("0 0.5 0.5 0.2 0.2\n")
    (lbl / "bad.txt").write_text("99 0.5 0.5 0.2 0.2\n0 1.5 0.5 0.2 0.2\nshort\n")
    v = DatasetValidator(tmp_path, num_classes=3)
    r = v.validate_dataset()
    assert r["total_files"] == 2 and r["invalid_files"] == 1
    # cache hit on re-run
    v2 = DatasetValidator(tmp_path, num_classes=3)
    r2 = v2.validate_dataset()
    assert r2["cached_hits"] == 2 and r2["invalid_files"] == 1
    # delete (dry run): label + paired image path accounted
    targets = v2.delete_invalid_files(dry_run=True)
    assert any("bad.txt" in t for t in targets)
    assert (lbl / "bad.txt").exists()


def test_visualization_draw(demo_image):
    from yolo_infer_tpu.data.loader import load_image
    from yolo_infer_tpu.utils.visualization import (
        create_grid_visualization,
        draw_detections,
        draw_keypoints,
        get_color,
    )

    img = load_image(demo_image)
    boxes = np.array([[10, 10, 60, 60]], np.float32)
    out = draw_detections(img, boxes, np.array([0.9]), np.array([0]), {0: "thing"})
    assert out.shape == img.shape and not np.array_equal(out, img)
    kp = np.zeros((1, 17, 3), np.float32)
    kp[0, :, :2] = 30
    kp[0, :, 2] = 1.0
    out2 = draw_keypoints(img, kp)
    assert out2.shape == img.shape
    grid = create_grid_visualization([img, img, img], cols=2, cell_size=(64, 64))
    assert grid.shape == (128, 128, 3)
    assert get_color(3) == get_color(13)  # 10-color cycle


def test_demo_video_pipeline(tmp_path, capsys):
    import cv2

    video = tmp_path / "v.mp4"
    w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 64))
    for i in range(10):
        frame = np.full((64, 64, 3), i * 20, np.uint8)
        w.write(frame)
    w.release()

    from yolo_infer_tpu.demos.detection_demo import DetectionDemo

    demo = DetectionDemo("n", conf_threshold=0.5, imgsz=64)
    out_path = tmp_path / "out.mp4"
    summary = demo.detect_video(video, out_path, batch_size=4, progress_every=0)
    assert summary["total_frames"] == 10
    assert out_path.exists() and out_path.stat().st_size > 0
    assert summary["fps"] > 0


def test_demo_video_draw_path_loaded(tmp_path):
    """conf=0 keeps max_det candidates per frame, so the drain actually
    scales/draws boxes — the leg the 2026-08-18 hardware run showed is
    silent at any realistic conf on random weights (cls-bias init puts
    scores at ~1e-5; tools/bench_video.py)."""
    import cv2

    video = tmp_path / "v2.mp4"
    w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 64))
    for i in range(6):
        w.write(np.full((64, 64, 3), 60 + i * 20, np.uint8))
    w.release()

    from yolo_infer_tpu.demos.detection_demo import DetectionDemo

    demo = DetectionDemo("n", conf_threshold=0.0, imgsz=64)
    out_path = tmp_path / "out2.mp4"
    summary = demo.detect_video(video, out_path, batch_size=4, progress_every=0)
    assert summary["total_frames"] == 6
    assert summary["total_detections"] > 0  # boxes were kept AND drawn
    assert out_path.exists() and out_path.stat().st_size > 0


def test_demo_task_parity(tmp_path):
    """reference main.py demo --task parity: every task runs end to end
    through DetectionDemo with task-aware drawing (draw_results)."""
    import numpy as np

    from yolo_infer_tpu.demos.detection_demo import DetectionDemo

    img = np.random.default_rng(0).integers(0, 255, (96, 128, 3), dtype=np.uint8)
    for task in ("segment", "classify", "obb"):
        demo = DetectionDemo(model_size="n", task=task, conf_threshold=0.01, imgsz=160)
        out = demo.detect_image(img, output_path=str(tmp_path / f"{task}.jpg"))
        assert out["annotated_image"].shape == img.shape, task
        assert (tmp_path / f"{task}.jpg").exists(), task
    try:
        DetectionDemo(task="nope")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
