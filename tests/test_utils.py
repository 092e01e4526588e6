"""Utility surfaces: helpers, IO loader, export script."""

import json
import time
from pathlib import Path

import numpy as np
import pytest

from yolo_infer_tpu.utils.helpers import (
    ProgressTracker,
    ResourceMonitor,
    Timer,
    backup_file,
    calculate_model_size,
    clean_old_files,
    compare_files,
    format_bytes,
    format_time,
    get_device_info,
    get_file_hash,
    load_config,
    merge_configs,
    save_config,
    validate_model_path,
)


def test_format_helpers():
    assert format_time(0.0000005) == "0.5us"
    assert format_time(0.5) == "500.0ms"
    assert format_time(90) == "1m30s"
    assert format_time(7260) == "2h1m"
    assert format_bytes(1536) == "1.5KB"


def test_config_roundtrip_and_merge(tmp_path):
    cfg = {"a": 1, "nested": {"x": 1, "y": 2}}
    p = tmp_path / "c.yaml"
    save_config(cfg, p)
    assert load_config(p) == cfg
    j = tmp_path / "c.json"
    save_config(cfg, j)
    assert load_config(j) == cfg
    merged = merge_configs(cfg, {"nested": {"y": 9}, "b": 2})
    assert merged == {"a": 1, "nested": {"x": 1, "y": 9}, "b": 2}
    assert cfg["nested"]["y"] == 2  # base untouched


def test_timer_and_tracker():
    with Timer("t") as t:
        time.sleep(0.01)
    assert t.elapsed >= 0.01
    pt = ProgressTracker(total=10)
    info = pt.update(5)
    assert info["count"] == 5 and info["rate"] > 0


def test_resource_monitor():
    mon = ResourceMonitor(interval=0.05)
    mon.start()
    time.sleep(0.2)
    summary = mon.stop()
    assert summary["samples"] >= 2
    assert "avg_cpu_percent" in summary


def test_file_utils(tmp_path):
    f = tmp_path / "a.txt"
    f.write_text("hello")
    g = tmp_path / "b.txt"
    g.write_text("hello")
    assert get_file_hash(f) == get_file_hash(g)
    assert compare_files(f, g)
    b = backup_file(f)
    assert b.exists() and b.parent.name == "backups"
    for i in range(5):
        (tmp_path / f"old{i}.log").write_text(str(i))
        time.sleep(0.01)
    removed = clean_old_files(tmp_path, "old*.log", keep_last=2)
    assert len(removed) == 3


def test_validate_model_path(tmp_path):
    assert validate_model_path("yolo11n")
    assert validate_model_path("yolo11x-seg")
    assert not validate_model_path("resnet50")
    p = tmp_path / "m.msgpack"
    p.write_bytes(b"x")
    assert validate_model_path(p)


def test_device_info():
    info = get_device_info()
    assert info["device_count"] >= 1
    assert "devices" in info


def test_dataloader_class(tmp_path):
    import cv2

    from yolo_infer_tpu.data.loader import DataLoader, list_image_files

    for i in range(5):
        cv2.imwrite(str(tmp_path / f"im{i}.jpg"), np.zeros((16, 16, 3), np.uint8))
    dl = DataLoader(tmp_path, batch_size=2, shuffle=True, seed=0)
    assert len(dl) == 3
    batches = list(dl)
    assert sum(len(p) for p, _ in batches) == 5
    assert batches[0][1][0].shape == (16, 16, 3)
    # re-iteration reshuffles but covers the same files
    order1 = [p for ps, _ in dl for p in ps]
    order2 = [p for ps, _ in dl for p in ps]
    assert set(order1) == set(order2) and len(order1) == 5
    assert len(list_image_files(tmp_path)) == 5


def test_export_script_stablehlo(tmp_path, monkeypatch):
    import subprocess
    import sys

    # run in-process to stay on the CPU test backend
    sys.argv = ["model_export.py", "yolo11n", "--format", "stablehlo", "--imgsz", "64", "--output", str(tmp_path / "m.mlir")]
    script = Path(__file__).resolve().parent.parent / "scripts" / "model_export.py"
    code = compile(script.read_text(), str(script), "exec")
    try:
        exec(code, {"__name__": "not_main"})
        ns = {}
        exec(code, ns)
        ns["main"]()
    except SystemExit as e:
        assert e.code in (0, None)
    out = tmp_path / "m.mlir"
    assert out.exists()
    text = out.read_text()
    assert "stablehlo" in text or "mhlo" in text or "func.func" in text


def test_resource_monitor_duty_cycle():
    """VERDICT r2 #8: resource samples carry a device_util_percent derived
    from instrumented device regions (DeviceDutyTracker)."""
    import time as _time

    from yolo_infer_tpu.utils.helpers import DEVICE_DUTY, ResourceMonitor, device_busy

    mon = ResourceMonitor(interval=0.05)
    before = DEVICE_DUTY.snapshot()
    mon.start()
    with device_busy():
        _time.sleep(0.2)
    _time.sleep(0.1)
    summary = mon.stop()
    assert DEVICE_DUTY.snapshot() - before >= 0.2
    assert "avg_device_util_percent" in summary
    assert summary["max_device_util_percent"] > 10.0  # busy window was sampled
    assert all(0.0 <= h["device_util_percent"] <= 100.0 for h in mon.history)


def test_get_device_info_has_duty_fields():
    from yolo_infer_tpu.utils.helpers import get_device_info

    info = get_device_info()
    assert "device_busy_s" in info and info["device_busy_s"] >= 0.0
