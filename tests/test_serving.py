"""Multi-chip (DP-sharded) inference + QAT training smoke."""

import numpy as np
import pytest
import yaml
import jax
import jax.numpy as jnp

from yolo_infer_tpu.parallel.mesh import create_mesh


def test_sharded_predictor_matches_single_device(tiny_deploy):
    from yolo_infer_tpu.core.predictor import Predictor

    params, spec = tiny_deploy
    mesh = create_mesh(n_devices=8)
    single = Predictor(params, spec, compute_dtype=jnp.float32)
    sharded = Predictor(params, spec, compute_dtype=jnp.float32, mesh=mesh)

    imgs = jnp.asarray(np.random.default_rng(0).integers(0, 255, (8, 64, 64, 3), dtype=np.uint8))
    a = single.predict_raw(imgs, 0.0001, 0.5, 64)
    b = sharded.predict_raw(imgs, 0.0001, 0.5, 64)
    np.testing.assert_array_equal(np.asarray(a["num"]), np.asarray(b["num"]))
    np.testing.assert_allclose(np.asarray(a["scores"]), np.asarray(b["scores"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a["boxes"]), np.asarray(b["boxes"]), atol=1e-2)
    # batch really is sharded over the data axis
    placed = sharded._place_batch(imgs)
    assert placed.sharding.spec[0] == "data"


def test_sharded_seg_predictor_masks_match(tiny_seg_deploy):
    """DP-sharded segment serving: the in-graph mask pipeline (lax.map over
    the sharded batch axis) must compile under GSPMD and agree with the
    single-device path."""
    from yolo_infer_tpu.core.predictor import Predictor

    params, spec = tiny_seg_deploy
    mesh = create_mesh(n_devices=8)
    single = Predictor(params, spec, compute_dtype=jnp.float32)
    sharded = Predictor(params, spec, compute_dtype=jnp.float32, mesh=mesh)

    imgs = [np.random.default_rng(i).integers(0, 255, (64, 64, 3), dtype=np.uint8) for i in range(8)]
    ra = single.predict(imgs, conf=0.001, imgsz=64)
    rb = sharded.predict(imgs, conf=0.001, imgsz=64)
    assert [len(r) for r in ra] == [len(r) for r in rb]
    assert any(len(r) for r in ra)
    for x, y in zip(ra, rb):
        if x.masks is None:
            assert y.masks is None
            continue
        np.testing.assert_array_equal(np.asarray(x.masks), np.asarray(y.masks))


@pytest.fixture(scope="module")
def tiny_seg_deploy():
    from yolo_infer_tpu.models import build_model, fold_model

    params, state, spec = build_model(jax.random.PRNGKey(0), "segment", "n", nc=3)
    return fold_model(params, state), spec


def test_qat_training_smoke(tmp_path):
    import cv2

    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.core.trainer import TrainingConfig, YOLO11Trainer

    img_dir = tmp_path / "images" / "train"
    lbl_dir = tmp_path / "labels" / "train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    for i in range(2):
        img = np.full((64, 64, 3), 90, np.uint8)
        cv2.rectangle(img, (8, 8), (40, 48), (255, 40, 40), -1)
        cv2.imwrite(str(img_dir / f"i{i}.jpg"), img)
        (lbl_dir / f"i{i}.txt").write_text("0 0.375 0.4375 0.5 0.625\n")
    data = tmp_path / "d.yaml"
    data.write_text(yaml.safe_dump({"path": str(tmp_path), "train": "images/train", "names": {0: "t"}, "nc": 1}))

    model = YOLO11Model("yolo11n", nc=1, compute_dtype=jnp.float32)
    cfg = TrainingConfig(
        data=str(data), epochs=1, batch=2, imgsz=64, max_boxes=4, qat=True,
        val=False, mosaic=0.0, project=str(tmp_path / "runs"), name="qat", patience=0,
    )
    out = YOLO11Trainer(model=model, config=cfg).train()
    assert out["status"] == "completed"
    assert out["skipped_steps"] == 0  # fake-quant must stay finite


def test_predict_many_pipelined_matches_predict():
    """Chunked pipelined prediction == single-batch prediction, including the
    repeat-padded final chunk and the heterogeneous-size letterbox path."""
    import numpy as np

    from yolo_infer_tpu.core.model import YOLO11Model

    rng = np.random.default_rng(0)
    m = YOLO11Model("yolo11n")
    imgs = [rng.integers(0, 255, (160, 160, 3), dtype=np.uint8) for _ in range(10)]

    many = m.predictor.predict_many(imgs, conf=0.01, imgsz=160, batch_size=4)
    assert len(many) == 10
    ref = m.predictor.predict(imgs[:4], conf=0.01, imgsz=160)
    for a, b in zip(many[:4], ref):
        np.testing.assert_allclose(a.boxes, b.boxes, atol=1e-4)
        np.testing.assert_array_equal(a.classes, b.classes)
    # exactly one compiled signature serves all chunks
    assert len({k[0] for k in m.predictor._cache}) == 1

    # heterogeneous sizes route through host letterbox, still one signature
    mixed = imgs[:3] + [rng.integers(0, 255, (120, 200, 3), dtype=np.uint8) for _ in range(3)]
    out = m.predictor.predict_many(mixed, conf=0.01, imgsz=160, batch_size=4)
    assert len(out) == 6 and out[-1].orig_shape == (120, 200)

    # model.predict routes batch= through the chunked path
    out2 = m.predict(imgs, conf=0.01, imgsz=160, batch=4)
    assert len(out2) == 10


def test_predict_empty_list_returns_empty():
    import numpy as np

    from yolo_infer_tpu.core.model import YOLO11Model

    m = YOLO11Model("yolo11n")
    assert m.predict([], imgsz=160) == []
