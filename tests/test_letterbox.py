"""Host letterbox semantics + device preprocess parity."""

import jax.numpy as jnp
import numpy as np

from yolo_infer_tpu.ops.letterbox import letterbox, letterbox_params, scale_boxes
from yolo_infer_tpu.ops.preprocess import preprocess_batch


def test_letterbox_shape_and_pad():
    img = np.full((480, 640, 3), 50, np.uint8)
    out, r, (dw, dh) = letterbox(img, 640)
    assert out.shape == (640, 640, 3)
    assert r == 1.0
    assert (dw, dh) == (0.0, 80.0)
    assert (out[0] == 114).all() and (out[-1] == 114).all()  # top/bottom pad
    assert (out[320] == 50).all()  # middle is image


def test_letterbox_scales_down():
    img = np.zeros((1280, 960, 3), np.uint8)
    out, r, (dw, dh) = letterbox(img, 640)
    assert out.shape == (640, 640, 3)
    assert r == 0.5
    assert dw == (640 - 480) / 2 and dh == 0.0


def test_scale_boxes_roundtrip():
    r, pad, _ = letterbox_params((480, 640), 640)
    orig = np.array([[10.0, 20.0, 300.0, 400.0]], np.float32)
    lb = orig * r + np.array([pad[0], pad[1], pad[0], pad[1]], np.float32)
    back = scale_boxes(lb, r, pad, (480, 640))
    np.testing.assert_allclose(back, orig, atol=1e-4)


def test_device_preprocess_pad_only_exact():
    # same aspect no-resize case: device path must match host letterbox exactly
    img = np.random.default_rng(0).integers(0, 255, (320, 640, 3), dtype=np.uint8)
    host, r, pad = letterbox(img, 640)
    dev = np.asarray(preprocess_batch(jnp.asarray(img[None]), out_hw=(640, 640)))
    np.testing.assert_allclose(dev[0], host.astype(np.float32) / 255.0, atol=1e-6)


def test_device_preprocess_resize_close_to_cv2():
    img = np.random.default_rng(1).integers(0, 255, (480, 512, 3), dtype=np.uint8)
    host, _, _ = letterbox(img, 320)
    dev = np.asarray(preprocess_batch(jnp.asarray(img[None]), out_hw=(320, 320)))
    diff = np.abs(dev[0] - host.astype(np.float32) / 255.0)
    # bilinear implementations differ slightly at edges; mean must be tiny
    assert diff.mean() < 0.01, diff.mean()
