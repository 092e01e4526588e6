"""AOT serving artifacts (core/exported.py): jax.export round-trip.

The artifact holds the WHOLE serving program (letterbox, forward with baked
weights, decode, NMS) as serialized StableHLO — the TPU analog of the
reference's ONNX export (reference official_scripts/model_export.py:1-7).
Loading needs no model code or checkpoints; results must match the live
predictor exactly.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from yolo_infer_tpu.core.exported import ExportedPredictor, export_predictor
from yolo_infer_tpu.core.model import YOLO11Model


@pytest.fixture(scope="module")
def nano():
    return YOLO11Model("yolo11n", nc=3, compute_dtype=jnp.float32)


def test_roundtrip_matches_live_predictor(nano, tmp_path):
    p = export_predictor(nano, tmp_path / "n.jaxexp", batch=2, imgsz=64)
    ep = ExportedPredictor.load(p)
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (80, 60, 3), dtype=np.uint8) for _ in range(2)]
    live = nano.predict(imgs, conf=1e-4, imgsz=64)
    exp = ep.predict(imgs, conf=1e-4)
    assert sum(len(r.scores) for r in live) > 0  # non-vacuous
    for a, b in zip(live, exp):
        assert len(a.scores) == len(b.scores)
        np.testing.assert_allclose(np.asarray(a.scores), np.asarray(b.scores), atol=1e-5)
        np.testing.assert_allclose(np.asarray(a.boxes), np.asarray(b.boxes), atol=0.1)
        assert b.names == nano.names


def test_classify_artifact(tmp_path):
    c = YOLO11Model("yolo11n-cls", nc=5, compute_dtype=jnp.float32)
    p = export_predictor(c, tmp_path / "cls.jaxexp", batch=1, imgsz=64)
    ep = ExportedPredictor.load(p)
    img = np.random.default_rng(1).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    r1 = c.predict(img, imgsz=64)[0]
    r2 = ep.predict(img)[0]
    np.testing.assert_allclose(r1.probs, r2.probs, atol=1e-5)


def test_signature_is_enforced(nano, tmp_path):
    p = export_predictor(nano, tmp_path / "n.jaxexp", batch=2, imgsz=64)
    ep = ExportedPredictor.load(p)
    with pytest.raises(ValueError, match="specialized"):
        ep.predict_raw(np.zeros((1, 64, 64, 3), np.uint8))
    with pytest.raises(ValueError, match="batch"):
        ep.predict([np.zeros((64, 64, 3), np.uint8)] * 3)


def test_conf_is_runtime_scalar(nano, tmp_path):
    """conf/iou are traced args of the artifact — different thresholds give
    different counts from the SAME program (no respecialization)."""
    p = export_predictor(nano, tmp_path / "n.jaxexp", batch=1, imgsz=64)
    ep = ExportedPredictor.load(p)
    img = np.random.default_rng(2).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    lo = ep.predict(img, conf=1e-5)[0]
    hi = ep.predict(img, conf=0.9)[0]
    assert len(lo.scores) >= len(hi.scores)
    assert len(lo.scores) > 0


def test_slim_model_exports(nano, tmp_path):
    """Surgery + export compose: the baked program uses the slimmed shapes."""
    from yolo_infer_tpu.optimization.pruning import PruningOptimizer

    slim = PruningOptimizer(nano, {"method": "structured", "physical": True, "sparsity": 0.5}).optimize()
    p = export_predictor(slim, tmp_path / "slim.jaxexp", batch=1, imgsz=64)
    dense = export_predictor(nano, tmp_path / "dense.jaxexp", batch=1, imgsz=64)
    # the slim artifact carries genuinely fewer weights than the dense export
    assert p.exists() and p.stat().st_size < dense.stat().st_size
    ep = ExportedPredictor.load(p)
    img = np.random.default_rng(3).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    a = slim.predict(img, conf=1e-4, imgsz=64)[0]
    b = ep.predict(img, conf=1e-4)[0]
    np.testing.assert_allclose(np.asarray(a.scores), np.asarray(b.scores), atol=1e-5)
