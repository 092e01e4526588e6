"""Oriented bounding boxes: decode + probIoU rotated NMS (jit-friendly).

The second bespoke kernel SURVEY.md §7 calls out (step 6 / hard part 1):
rotated suppression has no torchvision analog to lean on. Boxes are
(cx, cy, w, h, angle[rad]); IoU uses the Gaussian-approximation probIoU
(covariance form of a rotated box), which is closed-form, smooth, and maps
to pure VPU elementwise work — ideal for TPU, unlike polygon clipping.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax

from yolo_infer_tpu.ops.nms import _exact_topk, _nms_fixpoint, _on_tpu, _topc_per_anchor, MAX_WH


def dist2rbox(dist: jnp.ndarray, angle: jnp.ndarray, anchor_points: jnp.ndarray) -> jnp.ndarray:
    """DFL ltrb distances + angle -> rotated boxes (cx, cy, w, h) in grid units.

    The (l,t,r,b) offsets are interpreted in the box's rotated frame.
    """
    lt, rb = jnp.split(dist, 2, axis=-1)
    c, s = jnp.cos(angle), jnp.sin(angle)
    xf = (rb[..., 0] - lt[..., 0]) / 2
    yf = (rb[..., 1] - lt[..., 1]) / 2
    cx = xf * c - yf * s + anchor_points[..., 0]
    cy = xf * s + yf * c + anchor_points[..., 1]
    w = lt[..., 0] + rb[..., 0]
    h = lt[..., 1] + rb[..., 1]
    return jnp.stack([cx, cy, w, h], axis=-1)


def _cov(boxes: jnp.ndarray):
    """Rotated box -> Gaussian covariance terms (a, b, c)."""
    w = boxes[..., 2]
    h = boxes[..., 3]
    r = boxes[..., 4]
    a_ = (w**2) / 12.0
    b_ = (h**2) / 12.0
    cos = jnp.cos(r)
    sin = jnp.sin(r)
    a = a_ * cos**2 + b_ * sin**2
    b = a_ * sin**2 + b_ * cos**2
    c = (a_ - b_) * cos * sin
    return a, b, c


def _probiou_from_terms(a1, b1, c1, x1, y1, a2, b2, c2, x2, y2, eps):
    """Bhattacharyya/Hellinger probIoU from broadcast covariance terms — the
    ONE copy of the clamp chain (padding-row finiteness depends on the det
    clamps living inside the sqrt; ops/pallas/nms_fused.py mirrors it)."""
    dx = x1 - x2
    dy = y1 - y2
    sa = a1 + a2
    sb = b1 + b2
    sc = c1 + c2
    # Bhattacharyya distance with Sigma = (Sigma1 + Sigma2)/2, expressed via
    # the SUM S of covariances: (1/8) d^T Sigma^-1 d = 0.25 * d^T S^-1 d, and
    # det(Sigma) = det(S)/4 gives the 4x inside the log.
    denom = sa * sb - sc**2 + eps
    t1 = (sb * dx**2 + sa * dy**2 - 2 * sc * dx * dy) / denom * 0.25
    # clamp dets INSIDE the sqrt: zero-size (padding) boxes otherwise produce
    # inf backward gradients that survive later 0-weight masking as NaN
    det1 = jnp.maximum(a1 * b1 - c1**2, eps)
    det2 = jnp.maximum(a2 * b2 - c2**2, eps)
    t3 = jnp.log(denom / (4 * jnp.sqrt(det1 * det2) + eps) + eps) * 0.5
    bd = jnp.clip(t1 + t3, eps, 100.0)
    hd = jnp.sqrt(jnp.maximum(1.0 - jnp.exp(-bd), eps))
    return 1.0 - hd


def probiou_matrix(boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Pairwise probIoU: (N, 5) x (M, 5) -> (N, M) in [0, 1]."""
    a1, b1, c1 = _cov(boxes1)
    a2, b2, c2 = _cov(boxes2)
    x1, y1 = boxes1[..., 0], boxes1[..., 1]
    x2, y2 = boxes2[..., 0], boxes2[..., 1]
    a1, b1, c1, x1, y1 = (v[:, None] for v in (a1, b1, c1, x1, y1))
    a2, b2, c2, x2, y2 = (v[None, :] for v in (a2, b2, c2, x2, y2))
    return _probiou_from_terms(a1, b1, c1, x1, y1, a2, b2, c2, x2, y2, eps)


def probiou_pairs(b1: jnp.ndarray, b2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Element-aligned probIoU for identically-shaped (..., 5) boxes."""
    a1, b1_, c1 = _cov(b1)
    a2, b2_, c2 = _cov(b2)
    return _probiou_from_terms(a1, b1_, c1, b1[..., 0], b1[..., 1],
                               a2, b2_, c2, b2[..., 0], b2[..., 1], eps)


def rotated_nms_keep_mask(sup: jnp.ndarray, valid: jnp.ndarray, iou_thres: jnp.ndarray, k: int, impl: str = "auto") -> jnp.ndarray:
    """Greedy probIoU-NMS keep mask over (B, K, 5) score-sorted candidates.

    On TPU this runs the fused Pallas kernel (pairwise probIoU + fixpoint
    sweeps VMEM-resident — ops/pallas/nms_fused.py); elsewhere the XLA
    fixpoint. Both compute the identical keep mask. impl="xla" forces the
    fixpoint (required under a GSPMD mesh, where a pallas_call has no
    partitioning rule). Override globally with YOLO_NMS_IMPL=xla | pallas
    (on non-TPU backends `pallas` runs in interpret mode). Env var and
    backend probe are read at TRACE time — toggling after compile has no
    effect on cached signatures.
    """
    import os

    env = os.environ.get("YOLO_NMS_IMPL", "auto")
    if impl != "xla" and env != "xla" and (impl == "pallas" or env == "pallas" or _on_tpu()):
        from yolo_infer_tpu.ops.pallas.nms_fused import rotated_nms_keep_pallas

        ca, cb_, cc = _cov(sup)
        gauss = jnp.stack([sup[..., 0], sup[..., 1], ca, cb_, cc], axis=-1)
        return rotated_nms_keep_pallas(gauss, valid, iou_thres, interpret=not _on_tpu())

    def one(bx, va):
        return _nms_fixpoint(probiou_matrix(bx, bx), va, iou_thres, max_sweeps=k)

    return jax.vmap(one)(sup, valid)


@partial(jax.jit, static_argnames=("pre_topk", "max_det", "impl", "multi_label", "multi_label_topc"))
def batched_rotated_nms(
    rboxes: jnp.ndarray,  # (B, A, 5) xywhr, letterboxed pixels
    scores: jnp.ndarray,  # (B, A, nc)
    conf_thres=0.25,
    iou_thres=0.45,
    *,
    pre_topk: int = 1024,
    max_det: int = 300,
    impl: str = "auto",  # "xla" forces sort+fixpoint (meshed serving)
    multi_label: bool = False,
    multi_label_topc: int = 8,
) -> Dict[str, jnp.ndarray]:
    """Rotated NMS, batched end to end (no vmap): exact ApproxTopK candidate
    selection and the fused Pallas probIoU keep kernel on TPU (see
    ops.nms._exact_topk / rotated_nms_keep_mask). multi_label=True emits one
    candidate per (anchor, class) pair above conf — the ultralytics val
    protocol for OBB, matching the axis-aligned batched_nms."""
    conf_thres = jnp.asarray(conf_thres, jnp.float32)
    iou_thres = jnp.asarray(iou_thres, jnp.float32)
    rboxes = rboxes.astype(jnp.float32)
    scores = scores.astype(jnp.float32)
    b, a, nc = scores.shape
    if multi_label:
        c = multi_label_topc
        if c < nc:
            # per-anchor top-C class cap before the flat sort — see
            # ops/nms.py _single_nms for the rationale and exactness trade
            cls_scores, cls_idx = _topc_per_anchor(scores, c)  # (B, A, c)
            cand = jnp.where(cls_scores > conf_thres, cls_scores, -1.0).reshape(b, a * c)
            k = min(pre_topk, a * c)
            top_scores, top_pair = _exact_topk(cand, k, impl)
            top_idx = top_pair // c
            cls = jnp.take_along_axis(cls_idx.reshape(b, a * c), top_pair, axis=1).astype(jnp.float32)
        else:
            cand = jnp.where(scores > conf_thres, scores, -1.0).reshape(b, a * nc)
            k = min(pre_topk, a * nc)
            top_scores, top_pair = _exact_topk(cand, k, impl)
            top_idx = top_pair // nc
            cls = (top_pair % nc).astype(jnp.float32)
    else:
        best = jnp.max(scores, axis=-1)
        cls_best = jnp.argmax(scores, axis=-1).astype(jnp.float32)
        cand = jnp.where(best > conf_thres, best, -1.0)
        k = min(pre_topk, a)
        top_scores, top_idx = _exact_topk(cand, k, impl)
        cls = jnp.take_along_axis(cls_best, top_idx, axis=1)
    cb = jnp.take_along_axis(rboxes, top_idx[..., None], axis=1)
    valid = top_scores > 0
    # class-aware: shift centers apart per class
    sup = cb.at[..., 0].add(cls * MAX_WH)
    kept = rotated_nms_keep_mask(sup, valid, iou_thres, k, impl)
    final = jnp.where(kept, top_scores, -1.0)
    if k < max_det:
        pad = max_det - k
        final = jnp.concatenate([final, jnp.full((b, pad), -1.0)], axis=1)
        cb = jnp.concatenate([cb, jnp.zeros((b, pad, 5))], axis=1)
        cls = jnp.concatenate([cls, jnp.zeros((b, pad))], axis=1)
        top_idx = jnp.concatenate([top_idx, jnp.zeros((b, pad), top_idx.dtype)], axis=1)
    out_scores, sel = lax.top_k(final, max_det)
    out_valid = out_scores > 0
    z = jnp.float32(0)
    return {
        "boxes": jnp.where(out_valid[..., None], jnp.take_along_axis(cb, sel[..., None], axis=1), z),  # (B, max_det, 5) xywhr
        "scores": jnp.where(out_valid, out_scores, z),
        "classes": jnp.where(out_valid, jnp.take_along_axis(cls, sel, axis=1), -1.0),
        "valid": out_valid,
        "num": jnp.sum(out_valid.astype(jnp.int32), axis=1),
        "anchor_idx": jnp.where(out_valid, jnp.take_along_axis(top_idx, sel, axis=1), 0).astype(jnp.int32),
    }
