"""YOLO11 detection loss: task-aligned assignment + CIoU + DFL + BCE.

The reference gets its loss entirely from ultralytics (SURVEY.md §2b/§7:
box/cls/dfl weights 7.5/0.5/1.5, reference configs/default.yaml:48-50).
Rebuilt here as fully-vectorized JAX with static shapes: ground truth is
padded to `max_boxes` per image with a validity mask, the task-aligned
assigner is a batched (B, M, A) tensor program (no per-image Python loops),
and everything jits into the training step graph.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from yolo_infer_tpu.ops.decode import dist2bbox, make_anchors
from yolo_infer_tpu.ops.iou import bbox_iou_aligned

# hyperparameters (capability spec; reference configs/default.yaml:48-50)
DEFAULT_HYP = {
    "box": 7.5,
    "cls": 0.5,
    "dfl": 1.5,
    "tal_topk": 10,
    "tal_alpha": 0.5,
    "tal_beta": 6.0,
}
EPS = 1e-9


def task_aligned_assigner(
    pd_scores: jnp.ndarray,  # (B, A, nc) sigmoided
    pd_bboxes: jnp.ndarray,  # (B, A, 4) xyxy pixels
    anc_points: jnp.ndarray,  # (A, 2) pixels
    gt_labels: jnp.ndarray,  # (B, M) int32
    gt_bboxes: jnp.ndarray,  # (B, M, 4) xyxy pixels
    mask_gt: jnp.ndarray,  # (B, M) bool
    *,
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (target_bboxes (B,A,4), target_scores (B,A,nc), fg_mask (B,A),
    target_gt_idx (B,A))."""
    b, a, nc = pd_scores.shape
    m = gt_labels.shape[1]

    # anchors inside gt boxes: (B, M, A)
    lt = anc_points[None, None, :, :] - gt_bboxes[:, :, None, :2]
    rb = gt_bboxes[:, :, None, 2:] - anc_points[None, None, :, :]
    mask_in_gts = jnp.min(jnp.concatenate([lt, rb], axis=-1), axis=-1) > EPS

    # alignment metric
    cls_scores = jnp.take_along_axis(
        pd_scores.transpose(0, 2, 1), gt_labels.clip(0)[:, :, None], axis=1
    )  # (B, M, A)
    overlaps = bbox_iou_aligned(
        gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :], kind="ciou"
    ).clip(0)  # (B, M, A)
    align = (cls_scores**alpha) * (overlaps**beta)

    # top-k anchors per gt
    gate = mask_in_gts & mask_gt[:, :, None]
    cand = jnp.where(gate, align, -1.0)
    kth = jax.lax.top_k(cand, min(topk, a))[0][..., -1:]  # k-th best value per gt
    mask_topk = (cand >= jnp.maximum(kth, 0.0)) & (cand > 0)
    mask_pos = mask_topk & gate  # (B, M, A)

    # resolve anchors claimed by multiple gts: keep the gt with max overlap
    multi = jnp.sum(mask_pos, axis=1, keepdims=True) > 1  # (B, 1, A)
    max_overlap_gt = jnp.argmax(jnp.where(mask_pos, overlaps, -1.0), axis=1)  # (B, A)
    is_max = jax.nn.one_hot(max_overlap_gt, m, dtype=bool).transpose(0, 2, 1)  # (B, M, A)
    mask_pos = jnp.where(multi, mask_pos & is_max, mask_pos)
    fg_mask = jnp.any(mask_pos, axis=1)  # (B, A)
    target_gt_idx = jnp.argmax(mask_pos, axis=1)  # (B, A)

    # gather targets
    tgt_labels = jnp.take_along_axis(gt_labels, target_gt_idx, axis=1)  # (B, A)
    tgt_bboxes = jnp.take_along_axis(gt_bboxes, target_gt_idx[:, :, None], axis=1)  # (B, A, 4)
    tgt_scores = jax.nn.one_hot(tgt_labels, nc, dtype=jnp.float32) * fg_mask[:, :, None]

    # normalize scores by per-gt best alignment (soft targets)
    align_pos = jnp.where(mask_pos, align, 0.0)
    ovl_pos = jnp.where(mask_pos, overlaps, 0.0)
    per_gt_max_align = jnp.max(align_pos, axis=-1, keepdims=True)  # (B, M, 1)
    per_gt_max_ovl = jnp.max(ovl_pos, axis=-1, keepdims=True)
    norm = jnp.max(
        align_pos * per_gt_max_ovl / (per_gt_max_align + EPS), axis=1
    )  # (B, A)
    tgt_scores = tgt_scores * norm[:, :, None]
    return tgt_bboxes, tgt_scores, fg_mask, target_gt_idx


def _dfl_loss(pred_dist: jnp.ndarray, target: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """Distribution focal loss per element: pred_dist (..., 4, reg_max),
    target ltrb (..., 4) in grid units, already clamped to [0, reg_max-1)."""
    tl = jnp.floor(target)
    wr = target - tl
    wl = 1.0 - wr
    tl = tl.astype(jnp.int32)
    tr = jnp.minimum(tl + 1, reg_max - 1)
    logp = jax.nn.log_softmax(pred_dist, axis=-1)
    l_l = -jnp.take_along_axis(logp, tl[..., None], axis=-1)[..., 0]
    l_r = -jnp.take_along_axis(logp, tr[..., None], axis=-1)[..., 0]
    return jnp.mean(l_l * wl + l_r * wr, axis=-1)  # mean over 4 sides


def detection_loss(
    feats: List[jnp.ndarray],  # per-level (B, H, W, 4*reg_max+nc) raw head maps
    batch: Dict[str, jnp.ndarray],  # boxes (B,M,4) xyxy px, classes (B,M), mask (B,M)
    *,
    nc: int,
    reg_max: int = 16,
    strides: Sequence[int] = (8, 16, 32),
    hyp: Dict[str, float] = DEFAULT_HYP,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total detection loss (scalar) + per-component metrics."""
    b = feats[0].shape[0]
    feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchor_points, strd = make_anchors(feat_shapes, strides)  # grid units, (A,1)
    flat = jnp.concatenate([f.reshape(b, -1, f.shape[-1]) for f in feats], axis=1).astype(jnp.float32)
    pred_dist_logits = flat[..., : 4 * reg_max]
    cls_logits = flat[..., 4 * reg_max :]
    a = flat.shape[1]

    # decode boxes in grid units then pixels for the assigner
    dist = pred_dist_logits.reshape(b, a, 4, reg_max)
    probs = jax.nn.softmax(dist, axis=-1)
    ltrb = jnp.einsum("bafr,r->baf", probs, jnp.arange(reg_max, dtype=jnp.float32))
    pred_boxes_grid = dist2bbox(ltrb, anchor_points[None])  # (B, A, 4) grid units
    pred_boxes_px = pred_boxes_grid * strd[None]

    pd_scores = jax.nn.sigmoid(cls_logits)
    tgt_bboxes_px, tgt_scores, fg_mask, _ = task_aligned_assigner(
        pd_scores,
        pred_boxes_px,
        (anchor_points * strd),
        batch["classes"].astype(jnp.int32),
        batch["boxes"].astype(jnp.float32),
        batch["mask"].astype(bool),
        topk=int(hyp.get("tal_topk", 10)),
        alpha=float(hyp.get("tal_alpha", 0.5)),
        beta=float(hyp.get("tal_beta", 6.0)),
    )

    tgt_scores_sum = jnp.maximum(jnp.sum(tgt_scores), 1.0)

    # cls: BCE with soft targets over every anchor/class
    bce = optax_sigmoid_bce(cls_logits, tgt_scores)
    loss_cls = jnp.sum(bce) / tgt_scores_sum

    # box + dfl only on foreground anchors
    weight = jnp.sum(tgt_scores, axis=-1) * fg_mask  # (B, A)
    tgt_boxes_grid = tgt_bboxes_px / strd[None]
    iou = bbox_iou_aligned(pred_boxes_grid, tgt_boxes_grid, kind="ciou")
    loss_box = jnp.sum((1.0 - iou) * weight) / tgt_scores_sum

    tgt_ltrb = jnp.concatenate(
        [
            anchor_points[None] - tgt_boxes_grid[..., :2],
            tgt_boxes_grid[..., 2:] - anchor_points[None],
        ],
        axis=-1,
    ).clip(0, reg_max - 1 - 0.01)
    dfl = _dfl_loss(dist, tgt_ltrb, reg_max)  # (B, A)
    loss_dfl = jnp.sum(dfl * weight) / tgt_scores_sum

    total = (hyp["box"] * loss_box + hyp["cls"] * loss_cls + hyp["dfl"] * loss_dfl) * b
    metrics = {
        "loss": total,
        "loss_box": loss_box,
        "loss_cls": loss_cls,
        "loss_dfl": loss_dfl,
        "num_fg": jnp.sum(fg_mask.astype(jnp.int32)),
    }
    return total, metrics


def optax_sigmoid_bce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable sigmoid BCE (none-reduction)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def classification_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Softmax CE for the classify task."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    loss = jnp.mean(nll)
    acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
    return loss, {"loss": loss, "accuracy": acc}
