"""Letterbox preprocessing and its inverse.

Host-side reference implementation (numpy/cv2) with the exact semantics of
the reference's `preprocess_image_for_yolo` (reference utils/data_loader.py:
281-337): aspect-preserving scale, center pad with gray value 114, and the
inverse un-pad/un-scale/clamp of `postprocess_yolo_output` (data_loader.py:
340-374). The on-device fused version lives in `ops.preprocess`.
"""

from __future__ import annotations

from typing import Tuple, Union

import numpy as np

PAD_VALUE = 114


def letterbox_params(shape_hw: Tuple[int, int], new_shape: Union[int, Tuple[int, int]], scaleup: bool = True):
    """Compute (ratio, (dw, dh), (new_w, new_h)) for a letterbox resize."""
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    h, w = shape_hw
    r = min(new_shape[0] / h, new_shape[1] / w)
    if not scaleup:
        r = min(r, 1.0)
    new_w, new_h = round(w * r), round(h * r)
    dw, dh = (new_shape[1] - new_w) / 2, (new_shape[0] - new_h) / 2
    return r, (dw, dh), (new_w, new_h)


def letterbox(
    img: np.ndarray,
    new_shape: Union[int, Tuple[int, int]] = 640,
    color: int = PAD_VALUE,
    scaleup: bool = True,
) -> Tuple[np.ndarray, float, Tuple[float, float]]:
    """Resize `img` (H, W, 3 uint8) preserving aspect, center-pad to `new_shape`.

    Returns (padded_image, ratio, (dw, dh)).
    """
    import cv2

    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    r, (dw, dh), (new_w, new_h) = letterbox_params(img.shape[:2], new_shape, scaleup)
    if (img.shape[1], img.shape[0]) != (new_w, new_h):
        img = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    img = cv2.copyMakeBorder(img, top, bottom, left, right, cv2.BORDER_CONSTANT, value=(color, color, color))
    return img, r, (dw, dh)


def scale_obb(obb: np.ndarray, ratio: float, pad: Tuple[float, float]) -> np.ndarray:
    """Map rotated boxes (cx,cy,w,h,rad) from letterboxed coords to original."""
    out = np.asarray(obb, np.float32).copy()
    out[:, 0] = (out[:, 0] - pad[0]) / ratio
    out[:, 1] = (out[:, 1] - pad[1]) / ratio
    out[:, 2:4] /= ratio
    return out


def crop_letterbox_slices(ratio: float, pad: Tuple[float, float], orig_shape_hw: Tuple[int, int], downsample: int = 4) -> Tuple[int, int, int, int]:
    """(y0, x0, ch, cw) of the content region inside the letterboxed grid —
    the single source of the rounding rule (crop_letterbox_masks and
    LazyMasks.shape must agree)."""
    x0 = int(round(pad[0] / downsample))
    y0 = int(round(pad[1] / downsample))
    ch = max(int(round(orig_shape_hw[0] * ratio / downsample)), 1)
    cw = max(int(round(orig_shape_hw[1] * ratio / downsample)), 1)
    return y0, x0, ch, cw


def crop_letterbox_masks(masks: np.ndarray, ratio: float, pad: Tuple[float, float], orig_shape_hw: Tuple[int, int], downsample: int = 4) -> np.ndarray:
    """Remove the letterbox padding band from proto-grid masks so their aspect
    matches the original image (drawing then only needs a resize)."""
    if masks.size == 0:
        return masks
    y0, x0, ch, cw = crop_letterbox_slices(ratio, pad, orig_shape_hw, downsample)
    return masks[:, y0 : y0 + ch, x0 : x0 + cw]


def scale_boxes(
    boxes: np.ndarray,
    ratio: float,
    pad: Tuple[float, float],
    orig_shape_hw: Tuple[int, int],
) -> np.ndarray:
    """Map xyxy boxes from letterboxed coords back to the original image."""
    boxes = np.asarray(boxes, dtype=np.float32).copy()
    dw, dh = pad
    boxes[..., [0, 2]] -= dw
    boxes[..., [1, 3]] -= dh
    boxes /= ratio
    h, w = orig_shape_hw
    boxes[..., [0, 2]] = boxes[..., [0, 2]].clip(0, w)
    boxes[..., [1, 3]] = boxes[..., [1, 3]].clip(0, h)
    return boxes
