"""Anchor-free DFL box decode (device-side, jit-friendly).

Rebuilds the decode the reference inherits from ultralytics' Detect head
(SURVEY.md §7: DFL softmax-expectation -> dist2bbox over an anchor grid).
All shapes are static; everything fuses into the tail of the forward graph.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def make_anchors(
    feat_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    grid_cell_offset: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Anchor points (A, 2) in feature-grid units and per-anchor strides (A, 1)."""
    points, strd = [], []
    for (h, w), s in zip(feat_shapes, strides):
        sx = (jnp.arange(w, dtype=jnp.float32) + grid_cell_offset)
        sy = (jnp.arange(h, dtype=jnp.float32) + grid_cell_offset)
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        points.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
        strd.append(jnp.full((h * w, 1), float(s), dtype=jnp.float32))
    return jnp.concatenate(points, axis=0), jnp.concatenate(strd, axis=0)


def dfl_expectation(box_dist: jnp.ndarray, reg_max: int = 16, dtype=jnp.float32) -> jnp.ndarray:
    """(..., 4*reg_max) distribution logits -> (..., 4) expected l,t,r,b distances.

    `dtype` is the softmax compute dtype: f32 for the val/loss paths, the
    feats' bf16 for the speed path (error <0.1% of a bin)."""
    shape = box_dist.shape[:-1]
    logits = box_dist.reshape(*shape, 4, reg_max).astype(dtype)
    probs = jax.nn.softmax(logits, axis=-1)
    bins = jnp.arange(reg_max, dtype=dtype)
    return jnp.einsum("...r,r->...", probs, bins).astype(jnp.float32)


def dist2bbox(dist: jnp.ndarray, anchor_points: jnp.ndarray, xywh: bool = False) -> jnp.ndarray:
    """ltrb distances (A,4) + anchor points (A,2) -> boxes."""
    lt, rb = jnp.split(dist, 2, axis=-1)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return jnp.concatenate([c, wh], axis=-1)
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def decode_boxes_logits(
    feats: List[jnp.ndarray],
    nc: int,
    reg_max: int = 16,
    strides: Sequence[int] = (8, 16, 32),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-level raw head maps -> (boxes_xyxy f32 (B, A, 4), RAW cls logits).

    The DFL softmax-expectation runs in the feats' dtype (bf16 on TPU: the
    expectation error is <0.1% of a bin, invisible at pixel scale) and only
    the final boxes are promoted to f32.
    """
    feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchor_points, strd = make_anchors(feat_shapes, strides)
    b = feats[0].shape[0]
    flat = jnp.concatenate([f.reshape(b, -1, f.shape[-1]) for f in feats], axis=1)
    box_dist, cls_logits = flat[..., : 4 * reg_max], flat[..., 4 * reg_max :]
    dist = dfl_expectation(box_dist, reg_max, dtype=box_dist.dtype)
    boxes = dist2bbox(dist, anchor_points[None]) * strd[None]
    return boxes, cls_logits


def decode_for_nms(
    feats: List[jnp.ndarray],
    nc: int,
    reg_max: int = 16,
    strides: Sequence[int] = (8, 16, 32),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-level maps -> (boxes f32 (B,A,4), best_scores f32 (B,A), cls f32 (B,A)).

    The class reduction (max/argmax over nc) happens PER LEVEL before any
    concatenation, so the (B, A, 4*reg_max+nc) flattened tensor is never
    materialized — at b128/640² that saves ~0.5 GB of HBM traffic vs the
    concat-then-reduce formulation.
    """
    boxes_l, best_l, cls_l = [], [], []
    for f, stride in zip(feats, strides):
        b, h, w, _ = f.shape
        box_dist = f[..., : 4 * reg_max].reshape(b, h * w, 4 * reg_max)
        cls_logits = f[..., 4 * reg_max :]
        dist = dfl_expectation(box_dist, reg_max, dtype=box_dist.dtype)
        ap, _ = make_anchors([(h, w)], [stride])
        boxes_l.append(dist2bbox(dist, ap[None]) * float(stride))
        best_l.append(jnp.max(cls_logits, axis=-1).reshape(b, h * w))
        cls_l.append(jnp.argmax(cls_logits, axis=-1).reshape(b, h * w))
    boxes = jnp.concatenate(boxes_l, axis=1)
    best = jax.nn.sigmoid(jnp.concatenate(best_l, axis=1).astype(jnp.float32))
    cls = jnp.concatenate(cls_l, axis=1).astype(jnp.float32)
    return boxes, best, cls


def decode_scores_raw(
    feats: List[jnp.ndarray],
    nc: int,
    reg_max: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-level class reduction with NO box decode.

    -> (best f32 (B, A) sigmoided, cls f32 (B, A), box_dist (B, A, 4*reg_max)
    in the feats' raw dtype). Front half of the select-then-decode serving
    tail (ops.nms.batched_nms_seldec): the DFL expectation — the b32 device
    trace's divide/multiply family — runs later, on the pre_topk selected
    rows only, instead of on all A anchors here.
    """
    best_l, cls_l, dist_l = [], [], []
    for f in feats:
        b, h, w, _ = f.shape
        dist_l.append(f[..., : 4 * reg_max].reshape(b, h * w, 4 * reg_max))
        cls_logits = f[..., 4 * reg_max :]
        best_l.append(jnp.max(cls_logits, axis=-1).reshape(b, h * w))
        cls_l.append(jnp.argmax(cls_logits, axis=-1).reshape(b, h * w))
    best = jax.nn.sigmoid(jnp.concatenate(best_l, axis=1).astype(jnp.float32))
    cls = jnp.concatenate(cls_l, axis=1).astype(jnp.float32)
    return best, cls, jnp.concatenate(dist_l, axis=1)


def anchor_rows_from_idx(
    idx: jnp.ndarray,
    feat_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    grid_cell_offset: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Anchor points/strides for selected flat-grid indices, arithmetically.

    idx (B, K) int32 into the concatenated per-level anchor grid ->
    (anchor_points (B, K, 2) f32, strides (B, K, 1) f32). Pure vector math
    (level bucketing + divmod) — no gather of the (A, 3) table, and exact in
    f32 at any imgsz (a bf16 row-select of the table would corrupt anchor
    coords past grid 128). Matches make_anchors row-for-row (tests pin it).
    """
    x = jnp.zeros(idx.shape, jnp.float32)
    y = jnp.zeros(idx.shape, jnp.float32)
    st = jnp.zeros(idx.shape, jnp.float32)
    base = 0
    for (h, w), s in zip(feat_shapes, strides):
        in_level = (idx >= base) & (idx < base + h * w)
        li = idx - base
        x = jnp.where(in_level, (li % w).astype(jnp.float32) + grid_cell_offset, x)
        y = jnp.where(in_level, (li // w).astype(jnp.float32) + grid_cell_offset, y)
        st = jnp.where(in_level, float(s), st)
        base += h * w
    return jnp.stack([x, y], axis=-1), st[..., None]


def decode_detections(
    feats: List[jnp.ndarray],
    nc: int,
    reg_max: int = 16,
    strides: Sequence[int] = (8, 16, 32),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-level raw head maps -> (boxes_xyxy (B, A, 4), scores (B, A, nc)).

    Boxes are in letterboxed-image pixel coordinates; scores are sigmoided.
    DFL runs in f32 here (the val-accuracy path); the speed path is
    decode_boxes_logits + batched_nms_from_logits.
    """
    dist, scores, anchor_points, strd = decode_raw(feats, nc, reg_max, strides)
    boxes = dist2bbox(dist, anchor_points[None]) * strd[None]
    return boxes, scores


def decode_raw(
    feats: List[jnp.ndarray],
    nc: int,
    reg_max: int = 16,
    strides: Sequence[int] = (8, 16, 32),
):
    """Per-level maps -> (ltrb_dist (B,A,4), scores (B,A,nc), anchors (A,2), strd (A,1)).

    Shared front half of box decode; OBB combines the distances with a decoded
    angle (ops.rotated.dist2rbox) instead of dist2bbox.
    """
    if feats[0].shape[-1] != 4 * reg_max + nc:
        raise ValueError(
            f"head channels {feats[0].shape[-1]} != 4*reg_max+nc = {4 * reg_max + nc} "
            "(wrong reg_max/nc for this head?)")
    feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchor_points, strd = make_anchors(feat_shapes, strides)
    b = feats[0].shape[0]
    flat = jnp.concatenate([f.reshape(b, -1, f.shape[-1]) for f in feats], axis=1)
    box_dist, cls_logits = flat[..., : 4 * reg_max], flat[..., 4 * reg_max :]
    dist = dfl_expectation(box_dist, reg_max)
    scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    return dist, scores, anchor_points, strd


def decode_keypoints(
    kpts_flat: jnp.ndarray,
    anchor_points: jnp.ndarray,
    strd: jnp.ndarray,
    kpt_shape: Tuple[int, int] = (17, 3),
) -> jnp.ndarray:
    """Raw kpt maps flattened to (B, A, nk) -> decoded (B, A, K, 3) image coords.

    ``anchor_points``/``strd`` may be the shared (A, 2)/(A, 1) grid tables or
    per-row (B, A, 2)/(B, A, 1) selections — the serving tail decodes only
    the max_det NMS-selected rows (select-then-decode: the full-grid decode
    materialized (B, 8400, K, 3) f32 just to gather ~300 rows from it)."""
    b, a, _ = kpts_flat.shape
    k, d = kpt_shape
    y = kpts_flat.reshape(b, a, k, d).astype(jnp.float32)
    ap = anchor_points if anchor_points.ndim == 3 else anchor_points[None]
    st = strd if strd.ndim == 3 else strd[None]
    xy = (y[..., :2] * 2.0 + (ap[:, :, None, :] - 0.5)) * st[:, :, None, :]
    if d == 3:
        conf = jax.nn.sigmoid(y[..., 2:3])
        return jnp.concatenate([xy, conf], axis=-1)
    return xy
