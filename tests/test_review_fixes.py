"""Regression tests for the round-1 code-review findings."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_probiou_quadratic_factor_exact():
    # identical s x s axis-aligned boxes offset by dx = 0.35 s:
    # bd = 0.25 * dx^2 / (s^2/6) = 0.18375 -> probIoU = 1 - sqrt(1 - e^-bd) = 0.590
    from yolo_infer_tpu.ops.rotated import probiou_matrix

    s = 100.0
    a = jnp.asarray([[50.0, 50.0, s, s, 0.0]])
    b = jnp.asarray([[50.0 + 0.35 * s, 50.0, s, s, 0.0]])
    got = float(probiou_matrix(a, b)[0, 0])
    assert abs(got - 0.590) < 0.02, got


def test_adapt_head_keeps_backbone_weights():
    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.core.trainer import _adapt_head_nc

    m = YOLO11Model("yolo11n", nc=80, compute_dtype=jnp.float32)
    w0_before = np.asarray(m.params["0"]["w"]).copy()
    head_before = np.asarray(m.params["23"]["cv3"][0][-1]["w"]).copy()
    _adapt_head_nc(m, nc=3, names={0: "a", 1: "b", 2: "c"})
    assert m.nc == 3 and m.spec.nc == 3
    np.testing.assert_array_equal(w0_before, np.asarray(m.params["0"]["w"]))  # backbone kept
    assert m.params["23"]["cv3"][0][-1]["w"].shape[-1] == 3  # new head width
    img = np.zeros((64, 64, 3), np.uint8)
    res = m.predict(img, conf=0.001, imgsz=64)  # forward still works
    assert len(res) == 1


def test_benchmark_warmup_zero(tiny_deploy):
    from yolo_infer_tpu.core.model import YOLO11Model

    m = YOLO11Model("yolo11n", compute_dtype=jnp.float32)
    out = m.benchmark(imgsz=64, batch=1, runs=2, warmup=0)
    assert out["fps"] > 0


def test_masks_unletterboxed_aspect():
    from yolo_infer_tpu.core.model import YOLO11Model

    m = YOLO11Model("yolo11n-seg", compute_dtype=jnp.float32)
    img = np.random.default_rng(0).integers(0, 255, (48, 96, 3), dtype=np.uint8)
    res = m.predict(img, conf=0.0001, imgsz=64)[0]
    if not len(res) or res.masks is None:
        pytest.skip("no detections with random weights")
    # content occupies 32 of 64 letterbox rows; serving masks are upsampled
    # to imgsz before the letterbox crop -> rows 32, cols 64
    assert res.masks.shape[1:] == (32, 64)


def test_trainer_ships_ema_weights(tmp_path):
    import cv2
    import yaml

    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.core.trainer import TrainingConfig, YOLO11Trainer

    (tmp_path / "images/train").mkdir(parents=True)
    (tmp_path / "labels/train").mkdir(parents=True)
    for i in range(2):
        img = np.full((64, 64, 3), 90, np.uint8)
        cv2.rectangle(img, (8, 8), (40, 48), (255, 40, 40), -1)
        cv2.imwrite(str(tmp_path / f"images/train/i{i}.jpg"), img)
        (tmp_path / f"labels/train/i{i}.txt").write_text("0 0.375 0.4375 0.5 0.625\n")
    data = tmp_path / "d.yaml"
    data.write_text(yaml.safe_dump({"path": str(tmp_path), "train": "images/train", "names": {0: "t"}, "nc": 1}))

    model = YOLO11Model("yolo11n", nc=1, compute_dtype=jnp.float32)
    before = np.asarray(model.params["0"]["w"]).copy()
    # 3 steps with no warmup so the lr is nonzero and params actually move
    cfg = TrainingConfig(data=str(data), epochs=3, batch=2, imgsz=64, max_boxes=4, val=False,
                         warmup_epochs=0.0, mosaic=0.0, project=str(tmp_path / "runs"), name="e", patience=0)
    YOLO11Trainer(model=model, config=cfg).train()
    after = np.asarray(model.params["0"]["w"])
    assert not np.array_equal(before, after)  # shipped weights moved off init (EMA tracked the update)


def test_transfer_learn_separate_run_dirs(tmp_path):
    import cv2
    import yaml

    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.core.trainer import TrainingConfig, YOLO11Trainer

    (tmp_path / "images/train").mkdir(parents=True)
    (tmp_path / "labels/train").mkdir(parents=True)
    for i in range(2):
        cv2.imwrite(str(tmp_path / f"images/train/i{i}.jpg"), np.full((64, 64, 3), 90, np.uint8))
        (tmp_path / f"labels/train/i{i}.txt").write_text("0 0.5 0.5 0.5 0.5\n")
    data = tmp_path / "d.yaml"
    data.write_text(yaml.safe_dump({"path": str(tmp_path), "train": "images/train", "names": {0: "t"}, "nc": 1}))

    model = YOLO11Model("yolo11n", nc=1, compute_dtype=jnp.float32)
    cfg = TrainingConfig(data=str(data), epochs=1, batch=2, imgsz=64, max_boxes=4, val=False,
                         mosaic=0.0, project=str(tmp_path / "runs"), name="tl", patience=0)
    out = YOLO11Trainer(model=model, config=cfg).transfer_learn(str(data), epochs_frozen=1, epochs_unfrozen=1)
    assert out["status"] == "completed"
    assert (tmp_path / "runs" / "tl_phase1").exists()
    assert (tmp_path / "runs" / "tl_phase2").exists()


# ---- round-3 advisor findings (ADVICE.md round 2) ---------------------------


def test_predict_many_empty_list(tiny_deploy):
    from yolo_infer_tpu.core.predictor import Predictor

    params, spec = tiny_deploy
    p = Predictor(params, spec, compute_dtype=jnp.float32)
    assert p.predict_many([]) == []


def test_model_predict_empty_list_with_batch():
    from yolo_infer_tpu.core.model import YOLO11Model

    m = YOLO11Model("yolo11n", compute_dtype=jnp.float32)
    assert m.predict([], batch=4) == []


def test_model_predict_stacked_ndarray_honors_batch():
    """A 4D stacked batch + explicit `batch` routes through the chunked path."""
    from yolo_infer_tpu.core.model import YOLO11Model

    m = YOLO11Model("yolo11n", compute_dtype=jnp.float32)
    imgs = np.random.default_rng(0).integers(0, 255, (4, 64, 64, 3), dtype=np.uint8)
    res = m.predict(imgs, conf=0.001, imgsz=64, batch=2)
    assert len(res) == 4


def test_nms_impl_env_pallas_works_on_cpu(monkeypatch):
    """YOLO_NMS_IMPL=pallas on a non-TPU backend runs in interpret mode and
    matches the XLA fixpoint (advisor: it used to fail to lower)."""
    from yolo_infer_tpu.ops.nms import nms_keep_mask

    rng = np.random.default_rng(7)
    k = 64
    xy = rng.uniform(0, 80, (1, k, 2)).astype(np.float32)
    wh = rng.uniform(8, 40, (1, k, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], axis=-1))
    valid = jnp.ones((1, k), bool)
    thr = jnp.float32(0.5)
    monkeypatch.setenv("YOLO_NMS_IMPL", "xla")
    ref = np.asarray(nms_keep_mask(boxes, valid, thr, k))
    monkeypatch.setenv("YOLO_NMS_IMPL", "pallas")
    got = np.asarray(nms_keep_mask(boxes, valid, thr, k))
    np.testing.assert_array_equal(ref, got)
