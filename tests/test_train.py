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
    ts = init_train_state(jax.random.PRNGKey(0), "detect", "n", imgsz=64, lr=0.01, total_steps=60, warmup_steps=1)
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
    for _ in range(16):
        ts, metrics = step(ts, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    # early SGD+momentum steps on a random-init net are chaotic (hard
    # assigner flips); assert the TREND, not adjacent steps
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses
    assert int(np.asarray(ts.skipped)) == 0
    assert int(np.asarray(ts.step)) == 16


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


def test_warmup_mirrors_reference_interp():
    """make_optimizer must reproduce the reference's warmup loop exactly
    (reference robust_trainer.py:386-396): per-group lr via np.interp (bias
    group ramps DOWN from warmup_bias_lr=0.1, others up from 0), momentum
    interpolated 0.8 -> 0.937, torch-SGD nesterov semantics, decoupled-into-
    gradient weight decay on the 'w' group only. Verified against a plain
    numpy simulation of the torch update rule."""
    import numpy as np
    import optax

    from yolo_infer_tpu.core.train_step import make_optimizer

    lr0, lrf, nw, total, wd, mom, wmom, wbias = 0.01, 0.1, 10, 40, 1e-4, 0.937, 0.8, 0.1
    tx = make_optimizer(lr0, lrf=lrf, total_steps=total, warmup_steps=nw,
                        momentum=mom, weight_decay=wd, cos_lr=False,
                        warmup_momentum=wmom, warmup_bias_lr=wbias)
    rng = np.random.default_rng(0)
    params = {"0": {"w": rng.normal(0, 1, (3, 3, 4, 8)).astype(np.float32),
                    "gamma": rng.normal(1, 0.1, (8,)).astype(np.float32),
                    "beta": rng.normal(0, 0.1, (8,)).astype(np.float32)},
              "23": {"b": rng.normal(0, 0.1, (8,)).astype(np.float32)}}
    jp = jax.tree_util.tree_map(jnp.asarray, params)
    state = tx.init(jp)

    # numpy mirror of the reference update rule
    np_p = {k: {kk: vv.copy() for kk, vv in v.items()} for k, v in params.items()}
    np_buf = {k: {kk: np.zeros_like(vv) for kk, vv in v.items()} for k, v in params.items()}

    def ref_step(ni, grads):
        # the decay x-axis spans ALL steps incl. warmup — ultralytics' lf
        # advances during warmup, so the warmup interp target itself decays
        base = lr0 + (lr0 * lrf - lr0) * min(ni / total, 1.0)  # linear decay
        m_t = np.interp(ni, [0, nw], [wmom, mom]) if ni <= nw else mom
        for k, grp in grads.items():
            for kk, g in grp.items():
                is_bias = kk in ("b", "beta")
                lr = np.interp(ni, [0, nw], [wbias if is_bias else 0.0, base]) if ni <= nw else base
                d = g + (wd * np_p[k][kk] if kk == "w" and g.ndim > 1 else 0.0)
                np_buf[k][kk] = m_t * np_buf[k][kk] + d
                np_p[k][kk] = np_p[k][kk] - lr * (d + m_t * np_buf[k][kk])

    for ni in range(14):  # crosses the warmup boundary at ni=10
        grads = jax.tree_util.tree_map(lambda v: (rng.normal(0, 0.01, v.shape)).astype(np.float32), params)
        updates, state = tx.update(jax.tree_util.tree_map(jnp.asarray, grads), state, jp)
        jp = optax.apply_updates(jp, updates)
        ref_step(ni, grads)

    for k in params:
        for kk in params[k]:
            np.testing.assert_allclose(np.asarray(jp[k][kk]), np_p[k][kk], atol=1e-6, rtol=1e-5,
                                       err_msg=f"{k}/{kk}")


def test_warmup_zero_disables():
    """warmup_steps=0 must behave as plain decayed SGD from step 0 (the
    reference gates warmup on warmup_epochs > 0)."""
    from yolo_infer_tpu.core.train_step import make_optimizer

    tx = make_optimizer(0.01, total_steps=10, warmup_steps=0, weight_decay=0.0, cos_lr=False)
    p = {"0": {"w": jnp.ones((1, 1, 2, 2)), "b": jnp.ones((2,))}}
    state = tx.init(p)
    g = jax.tree_util.tree_map(jnp.ones_like, p)
    updates, _ = tx.update(g, state, p)
    # first step moves BOTH groups: lr0 * (g + m*g) with buf=g
    assert float(jnp.abs(updates["0"]["w"]).max()) > 1e-4
    assert float(jnp.abs(updates["0"]["b"]).max()) > 1e-4
