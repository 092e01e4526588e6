"""On-device segment mask assembly vs the host numpy path (VERDICT r2 #5)."""

import numpy as np
import pytest

import jax.numpy as jnp

from yolo_infer_tpu.core.predictor import _assemble_masks
from yolo_infer_tpu.ops.masks import assemble_mask_bits, unpack_mask_bits


@pytest.mark.parametrize("seed", range(3))
def test_device_masks_match_host_path(seed):
    """Bit-packed in-graph masks == host sigmoid/crop path thresholded at
    0.5, at proto resolution. (Allows a vanishing borderline-cell tolerance:
    XLA vs numpy matmul association can flip logits within ~1e-6 of 0.)"""
    rng = np.random.default_rng(seed)
    b, d, hm, wm, nm, imgsz = 2, 16, 16, 16, 8, 64
    proto = rng.normal(0, 1, (b, hm, wm, nm)).astype(np.float32)
    coefs = rng.normal(0, 0.5, (b, d, nm)).astype(np.float32)
    xy = rng.uniform(0, imgsz * 0.6, (b, d, 2))
    wh = rng.uniform(4, imgsz * 0.5, (b, d, 2))
    boxes = np.concatenate([xy, np.minimum(xy + wh, imgsz)], axis=-1).astype(np.float32)

    packed = np.asarray(assemble_mask_bits(jnp.asarray(proto), jnp.asarray(coefs), jnp.asarray(boxes), imgsz))
    assert packed.shape == (b, d, hm, wm // 8) and packed.dtype == np.uint8
    got = unpack_mask_bits(packed)

    for i in range(b):
        want = _assemble_masks(proto[i], coefs[i], boxes[i], imgsz) > 0.5
        mismatch = (got[i] != want).mean()
        assert mismatch < 1e-3, f"image {i}: mismatch fraction {mismatch}"


def test_device_masks_zero_for_padding_slots():
    """Invalid det slots carry zeroed boxes -> their masks must be empty."""
    b, d, hm, wm, nm, imgsz = 1, 4, 16, 16, 8, 64
    rng = np.random.default_rng(0)
    proto = rng.normal(0, 1, (b, hm, wm, nm)).astype(np.float32)
    coefs = rng.normal(0, 1, (b, d, nm)).astype(np.float32)
    boxes = np.zeros((b, d, 4), np.float32)
    boxes[0, 0] = [4, 4, 40, 40]  # one real det
    packed = np.asarray(assemble_mask_bits(jnp.asarray(proto), jnp.asarray(coefs), jnp.asarray(boxes), imgsz))
    masks = unpack_mask_bits(packed)[0]
    assert masks[0].any()
    assert not masks[1:].any()


def test_predictor_mask_modes_agree(tiny_seg_predictors):
    """Serving Results.masks: device mode (binary, upsampled) vs exact mode
    (float, ultralytics order, then thresholded) differ only on boundary
    cells."""
    p_dev, p_exact = tiny_seg_predictors
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    r_dev = p_dev.predict(img, conf=0.001, imgsz=64)[0]
    r_exact = p_exact.predict(img, conf=0.001, imgsz=64)[0]
    assert len(r_dev) == len(r_exact)
    if len(r_dev) and r_dev.masks is not None:
        assert r_dev.masks.shape == r_exact.masks.shape
        assert set(np.unique(r_dev.masks)) <= {0.0, 1.0}
        disagree = (r_dev.masks != (r_exact.masks > 0.5)).mean()
        assert disagree < 0.02, disagree


@pytest.fixture(scope="module")
def tiny_seg_predictors():
    import jax

    from yolo_infer_tpu.core.predictor import Predictor
    from yolo_infer_tpu.models import build_model, fold_model

    params, state, spec = build_model(jax.random.PRNGKey(0), "segment", "n", nc=3)
    deploy = fold_model(params, state)
    dev = Predictor(deploy, spec, compute_dtype=jnp.float32, mask_mode="device")
    exact = Predictor(deploy, spec, compute_dtype=jnp.float32, mask_mode="exact")
    return dev, exact
