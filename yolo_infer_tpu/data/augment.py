"""Training augmentation: mosaic, random affine, HSV, flip, mixup.

The reference exposes these as passthrough config to ultralytics (reference
core/trainer.py:609-637: hsv_h/hsv_s/hsv_v, degrees, translate, scale,
fliplr, mosaic, mixup, close_mosaic). Implemented natively, host-side
(numpy/cv2): augmentation is branchy per-image work that belongs on CPU,
overlapped with device steps by the prefetching loader; the device only ever
sees fixed-shape batches.
"""

from __future__ import annotations

import math
import random
from typing import Dict, List, Optional, Tuple

import numpy as np

DEFAULT_AUG = {
    "hsv_h": 0.015,
    "hsv_s": 0.7,
    "hsv_v": 0.4,
    "degrees": 0.0,
    "translate": 0.1,
    "scale": 0.5,
    "shear": 0.0,
    "fliplr": 0.5,
    "flipud": 0.0,
    "mosaic": 1.0,
    "mixup": 0.0,
    "close_mosaic": 10,
}


def hsv_augment(img: np.ndarray, rng: random.Random, h: float, s: float, v: float) -> np.ndarray:
    import cv2

    if h == 0 and s == 0 and v == 0:
        return img
    gains = np.array([rng.uniform(-1, 1) * h + 1, rng.uniform(-1, 1) * s + 1, rng.uniform(-1, 1) * v + 1])
    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
    hue, sat, val = cv2.split(hsv)
    lut_hue = ((np.arange(256) * gains[0]) % 180).astype(np.uint8)
    lut_sat = np.clip(np.arange(256) * gains[1], 0, 255).astype(np.uint8)
    lut_val = np.clip(np.arange(256) * gains[2], 0, 255).astype(np.uint8)
    hsv = cv2.merge([cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat), cv2.LUT(val, lut_val)])
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)


def random_affine(
    img: np.ndarray,
    boxes: np.ndarray,
    classes: np.ndarray,
    rng: random.Random,
    *,
    imgsz: int,
    degrees: float = 0.0,
    translate: float = 0.1,
    scale: float = 0.5,
    shear: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Random scale/rotate/translate to an (imgsz, imgsz) canvas; boxes follow."""
    import cv2

    h, w = img.shape[:2]
    # center to origin
    C = np.eye(3)
    C[0, 2] = -w / 2
    C[1, 2] = -h / 2
    # rotation + scale
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    R = np.eye(3)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)
    # shear
    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    # translate to canvas center +/- jitter
    T = np.eye(3)
    T[0, 2] = imgsz / 2 + rng.uniform(0.5 - translate, 0.5 + translate) * imgsz - imgsz / 2
    T[1, 2] = imgsz / 2 + rng.uniform(0.5 - translate, 0.5 + translate) * imgsz - imgsz / 2
    M = T @ S @ R @ C
    out = cv2.warpAffine(img, M[:2], dsize=(imgsz, imgsz), borderValue=(114, 114, 114))

    if len(boxes):
        n = len(boxes)
        corners = np.ones((n * 4, 3))
        corners[:, :2] = boxes[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(n * 4, 2)
        corners = corners @ M.T
        corners = corners[:, :2].reshape(n, 8)
        xs = corners[:, [0, 2, 4, 6]]
        ys = corners[:, [1, 3, 5, 7]]
        new = np.stack([xs.min(1), ys.min(1), xs.max(1), ys.max(1)], axis=1)
        new[:, [0, 2]] = new[:, [0, 2]].clip(0, imgsz)
        new[:, [1, 3]] = new[:, [1, 3]].clip(0, imgsz)
        # drop degenerate boxes
        wh = new[:, 2:] - new[:, :2]
        keep = (wh > 2).all(axis=1)
        boxes, classes = new[keep].astype(np.float32), classes[keep]
    return out, boxes, classes


def mosaic4(
    records: List[Dict[str, np.ndarray]],
    rng: random.Random,
    imgsz: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Classic 4-image mosaic on a 2x2 canvas of 2*imgsz, centered randomly."""
    import cv2

    s = imgsz
    yc = int(rng.uniform(s * 0.5, s * 1.5))
    xc = int(rng.uniform(s * 0.5, s * 1.5))
    canvas = np.full((2 * s, 2 * s, 3), 114, np.uint8)
    all_boxes, all_cls = [], []
    for i, r in enumerate(records[:4]):
        img = r["image"]
        h, w = img.shape[:2]
        scale = min(s / h, s / w)
        nh, nw = int(h * scale), int(w * scale)
        img = cv2.resize(img, (nw, nh))
        if i == 0:  # top-left
            x1a, y1a, x2a, y2a = max(xc - nw, 0), max(yc - nh, 0), xc, yc
            x1b, y1b = nw - (x2a - x1a), nh - (y2a - y1a)
        elif i == 1:  # top-right
            x1a, y1a, x2a, y2a = xc, max(yc - nh, 0), min(xc + nw, 2 * s), yc
            x1b, y1b = 0, nh - (y2a - y1a)
        elif i == 2:  # bottom-left
            x1a, y1a, x2a, y2a = max(xc - nw, 0), yc, xc, min(yc + nh, 2 * s)
            x1b, y1b = nw - (x2a - x1a), 0
        else:  # bottom-right
            x1a, y1a, x2a, y2a = xc, yc, min(xc + nw, 2 * s), min(yc + nh, 2 * s)
            x1b, y1b = 0, 0
        canvas[y1a:y2a, x1a:x2a] = img[y1b : y1b + (y2a - y1a), x1b : x1b + (x2a - x1a)]
        if len(r["boxes"]):
            b = r["boxes"] * scale
            b[:, [0, 2]] += x1a - x1b
            b[:, [1, 3]] += y1a - y1b
            all_boxes.append(b)
            all_cls.append(r["classes"])
    boxes = np.concatenate(all_boxes, 0).astype(np.float32) if all_boxes else np.zeros((0, 4), np.float32)
    cls = np.concatenate(all_cls, 0) if all_cls else np.zeros((0,), np.int32)
    boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, 2 * s)
    boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, 2 * s)
    return canvas, boxes, cls


def augment_sample(
    records: List[Dict[str, np.ndarray]],
    rng: random.Random,
    *,
    imgsz: int,
    hyp: Dict[str, float],
    use_mosaic: bool,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build one augmented training sample from 1 (plain) or 4 (mosaic) records."""
    if use_mosaic and len(records) >= 4:
        img, boxes, cls = mosaic4(records, rng, imgsz)
        img, boxes, cls = random_affine(
            img, boxes, cls, rng, imgsz=imgsz,
            degrees=hyp["degrees"], translate=hyp["translate"], scale=hyp["scale"], shear=hyp["shear"],
        )
    else:
        from yolo_infer_tpu.ops.letterbox import letterbox

        r = records[0]
        img, ratio, pad = letterbox(r["image"], imgsz)
        boxes = r["boxes"].copy() if len(r["boxes"]) else np.zeros((0, 4), np.float32)
        if len(boxes):
            boxes = boxes * ratio
            boxes[:, [0, 2]] += pad[0]
            boxes[:, [1, 3]] += pad[1]
        cls = r["classes"]
    img = hsv_augment(img, rng, hyp["hsv_h"], hyp["hsv_s"], hyp["hsv_v"])
    if rng.random() < hyp["fliplr"]:
        img = np.ascontiguousarray(img[:, ::-1])
        if len(boxes):
            boxes = boxes.copy()
            boxes[:, [0, 2]] = img.shape[1] - boxes[:, [2, 0]]
    if rng.random() < hyp.get("flipud", 0.0):
        img = np.ascontiguousarray(img[::-1])
        if len(boxes):
            boxes = boxes.copy()
            boxes[:, [1, 3]] = img.shape[0] - boxes[:, [3, 1]]
    return img, boxes.astype(np.float32), cls.astype(np.int32)
