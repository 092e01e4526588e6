"""YOLO11Model wrapper: init, predict, save/load parity, factory, checkpoint mgr."""

import jax.numpy as jnp
import numpy as np
import pytest

from yolo_infer_tpu.core.model import YOLO11Factory, YOLO11Model, parse_model_name
from yolo_infer_tpu.utils.checkpoint import CheckpointManager


def test_parse_model_name():
    assert parse_model_name("yolo11n") == ("n", "detect")
    assert parse_model_name("yolo11s-seg") == ("s", "segment")
    assert parse_model_name("weights/yolo11x-pose.pt") == ("x", "pose")
    assert parse_model_name("resnet50") is None


@pytest.fixture(scope="module")
def nano():
    return YOLO11Model("yolo11n", compute_dtype=jnp.float32)


def test_model_info(nano):
    info = nano.get_model_info()
    assert info["task"] == "detect"
    assert info["model_size"] == "n"
    assert 2.5e6 < info["parameters"] < 2.7e6


def test_predict_on_array(nano):
    img = np.random.default_rng(0).integers(0, 255, (96, 128, 3), dtype=np.uint8)
    res = nano.predict(img, conf=0.001, iou=0.5, imgsz=64)
    assert len(res) == 1
    r = res[0]
    assert r.orig_shape == (96, 128)
    assert r.boxes.shape[1] == 4 if len(r) else True
    # boxes clamped to original image
    if len(r):
        assert (r.boxes[:, [0, 2]] <= 128).all() and (r.boxes[:, [1, 3]] <= 96).all()


def test_save_load_roundtrip(nano, tmp_path):
    img = np.random.default_rng(1).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    before = nano.predict(img, conf=0.0001, iou=0.5, imgsz=64)[0]
    path = nano.save(tmp_path / "m.msgpack")
    loaded = YOLO11Model(path, compute_dtype=jnp.float32)
    after = loaded.predict(img, conf=0.0001, iou=0.5, imgsz=64)[0]
    assert len(before) == len(after)
    if len(before):
        np.testing.assert_allclose(before.boxes, after.boxes, atol=1e-3)
        np.testing.assert_allclose(before.scores, after.scores, atol=1e-5)


def test_factory():
    m = YOLO11Factory.create_classifier("n", compute_dtype=jnp.float32)
    assert m.task == "classify"
    img = np.zeros((64, 64, 3), np.uint8)
    res = m.predict(img, imgsz=64)
    assert res[0].probs.shape == (80,)
    np.testing.assert_allclose(res[0].probs.sum(), 1.0, atol=1e-4)


def test_checkpoint_manager(tmp_path):
    mgr = CheckpointManager(tmp_path, max_checkpoints=2)
    state = {"params": {"w": np.arange(4, dtype=np.float32)}, "step": np.int32(7)}
    for epoch in range(4):
        mgr.save_checkpoint(state, epoch=epoch, metrics={"loss": 1.0 / (epoch + 1)})
    ckpts = mgr.list_checkpoints()
    assert len(ckpts) == 2  # keep-last-N
    latest = mgr.get_latest_checkpoint()
    assert "0003" in latest.name
    restored = mgr.load_checkpoint()
    np.testing.assert_array_equal(restored["train_state"]["params"]["w"], state["params"]["w"])
    assert restored["epoch"] == 3
    assert restored["metrics"]["loss"] == 0.25
