"""Box IoU family (pairwise matrices and aligned pairs), jit-friendly.

TPU-native replacement for the torchvision C++ IoU/NMS support the reference
consumes through ultralytics (SURVEY.md §2b "NMS" row).
"""

from __future__ import annotations

import jax.numpy as jnp


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return (boxes[..., 2] - boxes[..., 0]).clip(0) * (boxes[..., 3] - boxes[..., 1]).clip(0)


def box_iou_matrix(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Pairwise IoU: a (N, 4), b (M, 4) xyxy -> (N, M)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clip(0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / (union + eps)


def bbox_iou_aligned(a: jnp.ndarray, b: jnp.ndarray, *, kind: str = "iou", eps: float = 1e-7) -> jnp.ndarray:
    """Element-aligned IoU/GIoU/DIoU/CIoU for boxes of identical leading shape (xyxy)."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = (rb - lt).clip(0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = box_area(a)
    area_b = box_area(b)
    union = area_a + area_b - inter + eps
    iou = inter / union
    if kind == "iou":
        return iou
    # enclosing box
    clt = jnp.minimum(a[..., :2], b[..., :2])
    crb = jnp.maximum(a[..., 2:], b[..., 2:])
    cwh = (crb - clt).clip(0)
    if kind == "giou":
        c_area = cwh[..., 0] * cwh[..., 1] + eps
        return iou - (c_area - union) / c_area
    c2 = cwh[..., 0] ** 2 + cwh[..., 1] ** 2 + eps
    ca = (a[..., :2] + a[..., 2:]) / 2
    cb = (b[..., :2] + b[..., 2:]) / 2
    rho2 = jnp.sum((ca - cb) ** 2, axis=-1)
    if kind == "diou":
        return iou - rho2 / c2
    if kind == "ciou":
        wa = a[..., 2] - a[..., 0]
        ha = a[..., 3] - a[..., 1]
        wb = b[..., 2] - b[..., 0]
        hb = b[..., 3] - b[..., 1]
        import jax

        v = (4 / jnp.pi**2) * (jnp.arctan(wb / (hb + eps)) - jnp.arctan(wa / (ha + eps))) ** 2
        alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
        return iou - (rho2 / c2 + v * alpha)
    raise ValueError(kind)


def xywh2xyxy(x: jnp.ndarray) -> jnp.ndarray:
    c, wh = x[..., :2], x[..., 2:4]
    half = wh / 2
    return jnp.concatenate([c - half, c + half], axis=-1)


def xyxy2xywh(x: jnp.ndarray) -> jnp.ndarray:
    a, b = x[..., :2], x[..., 2:4]
    return jnp.concatenate([(a + b) / 2, b - a], axis=-1)
