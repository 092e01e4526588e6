"""The NCHW early-stage (small-batch layout fix) is numerically exact.

models/early.py re-expresses layers 0-2 in NCHW for fused float serving;
the math must be identical to the NHWC path (same convs, same order), so
the golden/fidelity story is untouched (VERDICT r3 item 1 optimization).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from yolo_infer_tpu.core.model import YOLO11Model
from yolo_infer_tpu.models import early as E
from yolo_infer_tpu.models.yolo11 import forward


@pytest.fixture(scope="module")
def model():
    return YOLO11Model("yolo11n", compute_dtype=jnp.float32)


def _feats(model, x, monkeypatch, enabled):
    monkeypatch.setenv("YOLO_TPU_EARLY_NCHW", "1" if enabled else "0")
    out, _ = forward(model.deploy_params, None, model.spec, x, compute_dtype=jnp.float32)
    return [np.asarray(f) for f in out["feats"]]


def test_early_nchw_exact(model, monkeypatch):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 96, 96, 3)).astype(np.float32))
    ref = _feats(model, x, monkeypatch, enabled=False)
    got = _feats(model, x, monkeypatch, enabled=True)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)


def test_early_nchw_eligibility(model):
    assert E.eligible(model.deploy_params, model.spec)
    # quantized trees are rejected (conv_block owns the int8 path)
    from yolo_infer_tpu.nn.quantize import quantize_params_tree

    qp = quantize_params_tree(model.deploy_params)
    assert not E.eligible(qp, model.spec)


def test_early_tiled_exact(model, monkeypatch):
    """Quadrant tiling (the production small-batch path) is bit-exact: the
    halo covers the layer-0..2 receptive field, so interior outputs equal
    the untiled forward's."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (8, 64, 64, 3)).astype(np.float32))
    monkeypatch.setenv("YOLO_TPU_EARLY_TILED", "0")
    ref, _ = forward(model.deploy_params, None, model.spec, x, compute_dtype=jnp.float32)
    monkeypatch.setenv("YOLO_TPU_EARLY_TILED", "1")
    assert E.tiled_eligible(model.deploy_params, model.spec, 8, 64, 64)
    got, _ = forward(model.deploy_params, None, model.spec, x, compute_dtype=jnp.float32)
    for a, b in zip(ref["feats"], got["feats"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("batch,t", [(8, 2), (8, 4), (16, 2)])  # default + t=4 grid
def test_early_tiled_helper_matches_chain(model, batch, t, monkeypatch):
    """run_early_tiled == the plain layer-0..2 chain, bit-exact in bf16 too."""
    from yolo_infer_tpu.models.early import _nhwc_chain, run_early_tiled, tiles_per_side

    if t == 2:
        assert tiles_per_side(batch) == 2  # production default (hardware sweep)
    else:
        monkeypatch.setenv("YOLO_TPU_TILE_T", str(t))
        assert tiles_per_side(batch) == t
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (batch, 96, 96, 3)).astype(np.float32), jnp.bfloat16)
    ref = _nhwc_chain(model.deploy_params, model.spec, x, 2)
    got, _ = run_early_tiled(model.deploy_params, model.spec, x, 2)
    np.testing.assert_array_equal(np.asarray(ref, np.float32), np.asarray(got, np.float32))


def test_early_tiled_ineligible_batches(model):
    assert not E.tiled_eligible(model.deploy_params, model.spec, 1, 640, 640)
    assert not E.tiled_eligible(model.deploy_params, model.spec, 128, 640, 640)
    assert not E.tiled_eligible(model.deploy_params, model.spec, 32, 20, 20)
    # whole-batch tiling above b16 measured neutral (b32) to -10% (b64) — the
    # win lives in the b16 chunked-serving subgraphs (models/early.py)
    assert not E.tiled_eligible(model.deploy_params, model.spec, 32, 640, 640)
    assert not E.tiled_eligible(model.deploy_params, model.spec, 64, 640, 640)
    assert E.tiled_eligible(model.deploy_params, model.spec, 16, 640, 640)


def test_early_tiled_size_gate(model):
    """Tiling inside the chunk subgraphs is gated by size: the chunk/tile A/B
    matrix (tools/bench_chunk_tile_matrix.py, v5e 2026-08-19) measured it a
    win for n (2x at b64) and mildly for m/l, but a LOSS for s (+13%) and
    x (+10%) — their wider early channels already fill the lanes."""
    import dataclasses

    for sz, want in (("n", True), ("m", True), ("l", True), ("s", False), ("x", False)):
        spec2 = dataclasses.replace(model.spec, size=sz)
        assert E.tiled_eligible(model.deploy_params, spec2, 16, 640, 640) == want, sz


def test_early_tiled_predictor_u8_path(model, monkeypatch):
    """The serving program's u8-tile branch returns the same detections as
    the untiled program (square source, fused float params)."""
    rng = np.random.default_rng(4)
    imgs = jnp.asarray(rng.integers(0, 255, (8, 64, 64, 3), dtype=np.uint8))
    outs = {}
    for env in ("0", "1"):
        monkeypatch.setenv("YOLO_TPU_EARLY_TILED", env)
        model._predictor = None  # programs are built against the env knob
        dets = model.predictor.predict_raw(imgs, 0.001, 0.45, 64)
        outs[env] = {k: np.asarray(v) for k, v in dets.items()}
    model._predictor = None
    for k in outs["0"]:
        np.testing.assert_array_equal(outs["0"][k], outs["1"][k], err_msg=k)


def test_early_nchw_segment_predict(monkeypatch):
    """The predictor path (preprocess + early NCHW + heads) stays healthy."""
    m = YOLO11Model("yolo11n-seg", compute_dtype=jnp.float32)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    monkeypatch.setenv("YOLO_TPU_EARLY_NCHW", "1")
    res = m.predict(img, conf=0.25, imgsz=64)
    assert res[0].boxes is not None
