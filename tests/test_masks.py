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


@pytest.mark.parametrize("seed", range(3))
def test_q8_masks_match_host_path(seed):
    """uint8-quantized in-graph soft masks == host sigmoid/crop path within
    1/510 (the quantization step), at proto resolution."""
    from yolo_infer_tpu.core.predictor import _assemble_masks
    from yolo_infer_tpu.ops.masks import assemble_masks_q8

    rng = np.random.default_rng(seed)
    b, d, hm, wm, nm, imgsz = 2, 16, 16, 16, 8, 64
    proto = rng.normal(0, 1, (b, hm, wm, nm)).astype(np.float32)
    coefs = rng.normal(0, 0.5, (b, d, nm)).astype(np.float32)
    xy = rng.uniform(0, imgsz * 0.6, (b, d, 2))
    wh = rng.uniform(4, imgsz * 0.5, (b, d, 2))
    boxes = np.concatenate([xy, np.minimum(xy + wh, imgsz)], axis=-1).astype(np.float32)

    q8 = np.asarray(assemble_masks_q8(jnp.asarray(proto), jnp.asarray(coefs), jnp.asarray(boxes), imgsz))
    assert q8.shape == (b, d, hm, wm) and q8.dtype == np.uint8
    for i in range(b):
        want = _assemble_masks(proto[i], coefs[i], boxes[i], imgsz)
        np.testing.assert_allclose(q8[i] / 255.0, want, atol=1 / 510 + 1e-5)


@pytest.mark.parametrize("seed", range(2))
def test_upsampled_bits_match_host_path(seed):
    """In-graph sigmoid->crop->bilinear-upsample->threshold (the full
    ultralytics process_mask(upsample=True).gt_(0.5) serving order) == the
    host float path thresholded, away from sub-pixel threshold boundaries."""
    from yolo_infer_tpu.core.predictor import _assemble_masks
    from yolo_infer_tpu.ops.masks import assemble_mask_bits_up

    rng = np.random.default_rng(seed)
    b, d, hm, wm, nm, imgsz = 2, 8, 16, 16, 8, 64
    proto = rng.normal(0, 1, (b, hm, wm, nm)).astype(np.float32)
    coefs = rng.normal(0, 0.5, (b, d, nm)).astype(np.float32)
    xy = rng.uniform(0, imgsz * 0.6, (b, d, 2))
    wh = rng.uniform(4, imgsz * 0.5, (b, d, 2))
    boxes = np.concatenate([xy, np.minimum(xy + wh, imgsz)], axis=-1).astype(np.float32)

    packed = np.asarray(assemble_mask_bits_up(jnp.asarray(proto), jnp.asarray(coefs), jnp.asarray(boxes), imgsz))
    assert packed.shape == (b, d, imgsz, imgsz // 8) and packed.dtype == np.uint8
    got = unpack_mask_bits(packed)

    for i in range(b):
        want_soft = _assemble_masks(proto[i], coefs[i], boxes[i], imgsz, upsample=True)
        stable = np.abs(want_soft - 0.5) > 1e-3  # cv2-vs-XLA bilinear float noise
        mismatch = ((got[i] != (want_soft > 0.5)) & stable).mean()
        assert mismatch < 1e-3, f"image {i}: mismatch fraction {mismatch}"


@pytest.mark.parametrize("seed", range(2))
def test_upsampled_bits_half_grid_matches_oracle(seed):
    """assemble_mask_bits_up(out_size=imgsz//2) == bilinear-resize the soft
    cropped masks to the half grid, threshold at 0.5 (stable cells)."""
    import jax

    from yolo_infer_tpu.ops.masks import assemble_mask_bits_up

    rng = np.random.default_rng(seed)
    b, d, hm, wm, nm, imgsz = 2, 8, 16, 16, 8, 64
    half = imgsz // 2
    proto = rng.normal(0, 1, (b, hm, wm, nm)).astype(np.float32)
    coefs = rng.normal(0, 0.5, (b, d, nm)).astype(np.float32)
    xy = rng.uniform(0, imgsz * 0.6, (b, d, 2))
    wh = rng.uniform(4, imgsz * 0.5, (b, d, 2))
    boxes = np.concatenate([xy, np.minimum(xy + wh, imgsz)], axis=-1).astype(np.float32)

    packed = np.asarray(
        assemble_mask_bits_up(jnp.asarray(proto), jnp.asarray(coefs), jnp.asarray(boxes), imgsz, out_size=half)
    )
    assert packed.shape == (b, d, half, half // 8) and packed.dtype == np.uint8
    got = unpack_mask_bits(packed)

    for i in range(b):
        soft = _assemble_masks(proto[i], coefs[i], boxes[i], imgsz)  # proto res
        want_soft = np.asarray(jax.image.resize(jnp.asarray(soft), (d, half, half), method="bilinear"))
        stable = np.abs(want_soft - 0.5) > 1e-3
        mismatch = ((got[i] != (want_soft > 0.5)) & stable).mean()
        assert mismatch < 1e-3, f"image {i}: mismatch fraction {mismatch}"


@pytest.mark.parametrize("s", [1, 2, 4])
def test_repeat_mask_bits_matches_bool_repeat(s):
    """Packed-domain nearest upsample == unpack -> np.repeat on the bools."""
    from yolo_infer_tpu.ops.masks import repeat_mask_bits

    rng = np.random.default_rng(s)
    packed = rng.integers(0, 256, (3, 5, 4), dtype=np.uint8)
    got = unpack_mask_bits(repeat_mask_bits(packed, s))
    want = unpack_mask_bits(packed).repeat(s, axis=-2).repeat(s, axis=-1)
    np.testing.assert_array_equal(got, want)


def test_predictor_device_half_mode(tiny_seg_predictors):
    """mask_mode='device_half': Results.masks has the SAME shape as the
    full-res device mode (the host 2x-nearest + trim restores full-res
    geometry), values stay binary, and the LazyMasks trim math reproduces a
    manual unpack/repeat/crop of the raw half-grid buffer exactly. Boundary
    error vs the full-res mode is bounded (<=1 px band around each mask
    edge)."""
    from yolo_infer_tpu.core.predictor import LazyMasks, Predictor
    from yolo_infer_tpu.ops.letterbox import crop_letterbox_slices, letterbox_params
    from yolo_infer_tpu.ops.masks import unpack_mask_bits

    p_dev, _, _ = tiny_seg_predictors
    p_half = Predictor(p_dev.params, p_dev.spec, compute_dtype=jnp.float32, mask_mode="device_half")
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)  # non-square: real letterbox band
    r_dev = p_dev.predict(img, conf=0.001, imgsz=64)[0]
    r_half = p_half.predict(img, conf=0.001, imgsz=64)[0]
    assert len(r_half) == len(r_dev)
    if not len(r_dev) or r_dev.masks is None:
        pytest.skip("no detections from the random-init net")
    assert isinstance(r_half.masks, LazyMasks) and r_half.masks._scale == 2
    assert r_half.masks.shape == r_dev.masks.shape  # cheap introspection, full-res
    half = np.asarray(r_half.masks)
    full = np.asarray(r_dev.masks)
    assert half.shape == full.shape and set(np.unique(half)) <= {0.0, 1.0}

    # exact contract: the lazy read == manual unpack + 2x nearest + trim
    raw = np.asarray(
        p_half.predict_raw(jnp.asarray(img[None]), 0.001, 0.45, 64, mask_out="device_half")["mask_bits_up"]
    )
    assert raw.shape[2] == 32  # half grid
    n = half.shape[0]
    man = unpack_mask_bits(raw[0, :n]).repeat(2, axis=1).repeat(2, axis=2)
    ratio, pad, _ = letterbox_params(img.shape[:2], 64)
    y0, x0, ch, cw = crop_letterbox_slices(ratio, pad, img.shape[:2], downsample=1)
    np.testing.assert_array_equal(half, man[:, y0: y0 + ch, x0: x0 + cw].astype(np.float32))

    # approximation quality: disagreements only within 1 full-res pixel of a
    # full-res mask boundary (nearest-2x can only miss sub-cell crossings)
    diff = half != full
    if diff.any():
        edge = np.zeros_like(full, bool)
        e = full.astype(bool)
        edge[:, 1:, :] |= e[:, 1:, :] != e[:, :-1, :]
        edge[:, :-1, :] |= e[:, 1:, :] != e[:, :-1, :]
        edge[:, :, 1:] |= e[:, :, 1:] != e[:, :, :-1]
        edge[:, :, :-1] |= e[:, :, 1:] != e[:, :, :-1]
        # dilate the edge band by 1
        band = edge.copy()
        band[:, 1:, :] |= edge[:, :-1, :]
        band[:, :-1, :] |= edge[:, 1:, :]
        band[:, :, 1:] |= edge[:, :, :-1]
        band[:, :, :-1] |= edge[:, :, 1:]
        off_band = (diff & ~band).mean()
        assert off_band < 5e-3, f"half-grid masks differ away from boundaries: {off_band}"


def test_lazy_masks_prefetch_half_grid(tiny_seg_predictors):
    """prefetch must honor the half-grid fetch windows (grid-space union,
    per-image full-res trim) and match the per-image read exactly."""
    from yolo_infer_tpu.core.predictor import LazyMasks, Predictor

    p_dev, _, _ = tiny_seg_predictors
    p_half = Predictor(p_dev.params, p_dev.spec, compute_dtype=jnp.float32, mask_mode="device_half")
    rng = np.random.default_rng(9)
    imgs = [rng.integers(0, 255, (48, 64, 3), dtype=np.uint8),
            rng.integers(0, 255, (64, 64, 3), dtype=np.uint8),
            rng.integers(0, 255, (64, 40, 3), dtype=np.uint8)]
    ra = p_half.predict(imgs, conf=0.001, imgsz=64)
    rb = p_half.predict(imgs, conf=0.001, imgsz=64)
    lazies = [r.masks for r in ra if isinstance(r.masks, LazyMasks)]
    if not lazies:
        pytest.skip("no detections from the random-init net")
    LazyMasks.prefetch(ra)
    for r1, r2 in zip(ra, rb):
        if isinstance(r2.masks, LazyMasks):
            assert r1.masks._np is not None
            np.testing.assert_array_equal(np.asarray(r1.masks), np.asarray(r2.masks))


def test_predictor_mask_modes_agree(tiny_seg_predictors):
    """Serving Results.masks across modes vs the exact host-float oracle:
    device mode (in-graph upsample+threshold, binary, lazy) must agree
    binarily on threshold-stable cells; q8 mode (soft) must match within the
    1/510 quantization bound."""
    from yolo_infer_tpu.core.predictor import LazyMasks

    p_dev, p_q8, p_exact = tiny_seg_predictors
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    r_dev = p_dev.predict(img, conf=0.001, imgsz=64)[0]
    r_q8 = p_q8.predict(img, conf=0.001, imgsz=64)[0]
    r_exact = p_exact.predict(img, conf=0.001, imgsz=64)[0]
    assert len(r_dev) == len(r_q8) == len(r_exact)
    if len(r_dev) and r_dev.masks is not None:
        # the device mode's masks are a device-resident lazy view: cheap
        # introspection must not trigger the transfer
        assert isinstance(r_dev.masks, LazyMasks)
        assert len(r_dev.masks) == len(r_exact.masks)
        assert r_dev.masks.shape == r_exact.masks.shape
        assert r_dev.masks._np is None, "shape/len access must stay lazy"
        dev = np.asarray(r_dev.masks)  # materializes (transfer + unpack)
        assert r_dev.masks._np is not None and r_dev.masks._dev is None
        assert set(np.unique(dev)) <= {0.0, 1.0}  # ultralytics .gt_(0.5) semantics
        # untrained-net mask values hover at sigmoid(~0) = 0.5, so threshold
        # flips are expected exactly there; binary agreement is asserted on
        # threshold-STABLE cells (XLA-vs-numpy float noise is ~1e-6)
        stable = np.abs(r_exact.masks - 0.5) > 1e-3
        disagree = (((dev > 0.5) != (r_exact.masks > 0.5)) & stable).mean()
        assert disagree == 0.0, disagree
        # q8 soft path: ultralytics upsample-floats-then-threshold order,
        # within quantization of the exact float masks
        np.testing.assert_allclose(r_q8.masks, r_exact.masks, atol=0.005)


def test_predict_many_drains_masks_to_host(tiny_seg_predictors):
    """The bulk API must not pin one device mask buffer per chunk: at drain
    the packed masks move to the host in one bounded transfer (LazyMasks then
    unpacks lazily from host memory), with per-image letterbox geometry
    intact on heterogeneous inputs."""
    from yolo_infer_tpu.core.predictor import LazyMasks

    p_dev, _, _ = tiny_seg_predictors
    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 255, (64, 64, 3), dtype=np.uint8),
            rng.integers(0, 255, (32, 64, 3), dtype=np.uint8),
            rng.integers(0, 255, (64, 32, 3), dtype=np.uint8)]
    res = p_dev.predict_many(imgs, conf=0.001, imgsz=64, batch_size=2)
    assert len(res) == 3
    assert any(r.masks is not None for r in res)  # non-vacuous
    for r, im in zip(res, imgs):
        if r.masks is None:
            continue
        assert isinstance(r.masks, LazyMasks)
        assert isinstance(r.masks._dev, np.ndarray), "packed masks must be host-side after drain"
        h, w = im.shape[:2]
        mh, mw = r.masks.shape[1:]
        # letterbox-cropped mask aspect tracks the source image
        assert abs(mh / mw - h / w) < 0.1, (im.shape, r.masks.shape)
        m = np.asarray(r.masks)  # lazy unpack from the host-packed buffer
        assert m.shape == (len(r.masks), mh, mw) and set(np.unique(m)) <= {0.0, 1.0}


def test_lazy_masks_prefetch_one_transfer(tiny_seg_predictors):
    """LazyMasks.prefetch materializes a whole batch identically to the
    per-image path (same banded crop math), and attribute probes for
    non-ndarray names never trigger the transfer."""
    from yolo_infer_tpu.core.predictor import LazyMasks

    p_dev, _, _ = tiny_seg_predictors
    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 255, (48, 64, 3), dtype=np.uint8) for _ in range(3)]
    ra = p_dev.predict(imgs, conf=0.001, imgsz=64)
    rb = p_dev.predict(imgs, conf=0.001, imgsz=64)
    lazies = [r.masks for r in ra if isinstance(r.masks, LazyMasks)]
    assert lazies, "need lazy masks for a meaningful test"
    # non-ndarray attribute probes stay lazy (no hidden 67 ms transfer)
    assert not hasattr(lazies[0], "cpu") and not hasattr(lazies[0], "to")
    assert lazies[0]._np is None
    LazyMasks.prefetch(ra)
    for r1, r2 in zip(ra, rb):
        if isinstance(r2.masks, LazyMasks):
            assert r1.masks._np is not None, "prefetch must materialize"
            np.testing.assert_array_equal(np.asarray(r1.masks), np.asarray(r2.masks))


def test_lazy_masks_prefetch_sparse_and_dtype(tiny_seg_predictors):
    """prefetch's contiguous-slice fast path must fall back to per-image
    reads when the pending images are sparse in their bounding index range
    (an advanced-index gather is ~30x slower on TPU than the basic slice —
    tools/bench_mask_read_split.py), and the uint8 fast path must return the
    same {0,1} masks without the f32 widening."""
    from yolo_infer_tpu.core.predictor import LazyMasks

    p_dev, _, _ = tiny_seg_predictors
    rng = np.random.default_rng(11)
    imgs = [rng.integers(0, 255, (64, 64, 3), dtype=np.uint8) for _ in range(5)]
    ra = p_dev.predict(imgs, conf=0.001, imgsz=64)
    rb = p_dev.predict(imgs, conf=0.001, imgsz=64)
    # keep only images 0 and 4: 2 pending over a bounding range of 5 -> sparse
    sparse = [ra[0], ra[4]]
    LazyMasks.prefetch(sparse)
    for r1, r2 in ((ra[0], rb[0]), (ra[4], rb[4])):
        if isinstance(r2.masks, LazyMasks):
            assert r1.masks._np is not None
            np.testing.assert_array_equal(np.asarray(r1.masks), np.asarray(r2.masks))
    # uint8 read: same values, no f32 cast
    m2 = rb[1].masks
    if isinstance(m2, LazyMasks):
        u8 = m2.numpy(dtype=np.uint8)
        assert u8.dtype == np.uint8 and set(np.unique(u8)) <= {0, 1}
        np.testing.assert_array_equal(u8, np.asarray(ra[1].masks).astype(np.uint8))


def test_predictor_bits_mode_binary(tiny_seg_predictors):
    """mask_out='bits' via predict_raw yields the packed val artifact."""
    import jax.numpy as jnp

    p_dev, _, _ = tiny_seg_predictors
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    dets = p_dev.predict_raw(jnp.asarray(img), 0.001, 0.5, 64, multi_label=True, mask_out="bits")
    assert "mask_bits" in dets and "mask_q8" not in dets
    masks = unpack_mask_bits(np.asarray(dets["mask_bits"]))
    assert masks.dtype == bool and masks.shape[-1] == 16  # proto res 64/4


@pytest.fixture(scope="module")
def tiny_seg_predictors():
    import jax

    from yolo_infer_tpu.core.predictor import Predictor
    from yolo_infer_tpu.models import build_model, fold_model

    params, state, spec = build_model(jax.random.PRNGKey(0), "segment", "n", nc=3)
    deploy = fold_model(params, state)
    dev = Predictor(deploy, spec, compute_dtype=jnp.float32, mask_mode="device")
    q8 = Predictor(deploy, spec, compute_dtype=jnp.float32, mask_mode="q8")
    exact = Predictor(deploy, spec, compute_dtype=jnp.float32, mask_mode="exact")
    return dev, q8, exact


def test_mask_out_none_skips_mask_assembly(tiny_seg_predictors):
    """Box-metric val loops request mask_out='none': the compiled program
    must carry NO mask artifact (nothing computed, nothing to sync), and the
    compile-cache key must dedupe mask_out=None vs an explicit mask_out equal
    to the predictor's own mask_mode (identical programs, one compile)."""
    p_dev, _, _ = tiny_seg_predictors
    img = jnp.zeros((1, 64, 64, 3), jnp.uint8)
    dets = p_dev.predict_raw(img, 0.25, 0.45, 64, mask_out="none")
    assert not any(k.startswith("mask") or k == "proto" for k in dets), list(dets)
    # cache normalization: None == default mode -> same entry, no recompile
    # (the fixture is shared, so assert on KEYS, not cache size)
    p_dev.predict_raw(img, 0.25, 0.45, 64)  # mask_out=None (default 'device')
    p_dev.predict_raw(img, 0.25, 0.45, 64, mask_out="device")
    # key layout: (batch, src_hw, imgsz, multi_label, max_det, pre_topk,
    # mask_out, trace_env) — mask_out is index 6 (the r5 key appends the
    # trace-time env-knob tuple last)
    keys = [k for k in p_dev._cache if k[0] == 1 and k[1] == (64, 64) and k[6] == "device"]
    assert len(keys) == 1, keys
    assert not any(k[6] is None for k in p_dev._cache), "un-normalized cache key"


@pytest.mark.parametrize("shape", [(160, 640), (16, 64), (20, 48)])
def test_bilinear_matmul_matches_jax_image_resize(shape):
    """The MXU matmul upsample must reproduce jax.image.resize bilinear
    exactly (it is the same linear map as two dense matrices)."""
    import jax

    from yolo_infer_tpu.ops.masks import _upsample_bilinear_mm

    in_s, out_s = shape
    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.random((5, in_s, in_s)).astype(np.float32))
    want = jax.image.resize(m, (5, out_s, out_s), method="bilinear")
    got = _upsample_bilinear_mm(m, (out_s, out_s))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)
