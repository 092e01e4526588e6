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


def _assign_from_align(
    align: jnp.ndarray,  # (B, M, A) alignment metric cls^alpha * ovl^beta
    overlaps: jnp.ndarray,  # (B, M, A) gt-vs-pred overlap (CIoU or probIoU)
    gate: jnp.ndarray,  # (B, M, A) bool: anchor inside gt AND gt valid
    gt_labels: jnp.ndarray,  # (B, M) int
    gt_boxes: jnp.ndarray,  # (B, M, F) target geometry (F=4 xyxy / F=5 rbox)
    nc: int,
    topk: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shared TAL core: top-k gating, multi-gt conflict resolution, one-hot
    target gathers, and soft-score normalization. Used by BOTH the
    axis-aligned assigner and obb_loss's rotated assigner — the overlap
    function (CIoU vs probIoU) and in-gt gate are the only differences, so
    any fix to the selection semantics lands in one place.

    Returns (target_boxes (B,A,F), target_scores (B,A,nc), fg_mask (B,A),
    target_gt_idx (B,A))."""
    m, a = align.shape[1], align.shape[2]

    # top-k anchors per gt. Only the k-th best VALUE is needed; the exact
    # ApproxTopK lowering (ops/nms.py _exact_topk) avoids lax.top_k's full
    # variadic sort over (B*M, A) — measured part of the 13.9 ms assign
    # stage at n/b32 (tools/profile_loss.py)
    from yolo_infer_tpu.ops.nms import _exact_topk

    cand = jnp.where(gate, align, -1.0)
    kth = _exact_topk(cand, min(topk, a))[0][..., -1:]  # k-th best value per gt
    mask_topk = (cand >= jnp.maximum(kth, 0.0)) & (cand > 0)
    mask_pos = mask_topk & gate  # (B, M, A)

    # resolve anchors claimed by multiple gts: keep the gt with max overlap
    multi = jnp.sum(mask_pos, axis=1, keepdims=True) > 1  # (B, 1, A)
    max_overlap_gt = jnp.argmax(jnp.where(mask_pos, overlaps, -1.0), axis=1)  # (B, A)
    is_max = jax.nn.one_hot(max_overlap_gt, m, dtype=bool).transpose(0, 2, 1)  # (B, M, A)
    mask_pos = jnp.where(multi, mask_pos & is_max, mask_pos)
    fg_mask = jnp.any(mask_pos, axis=1)  # (B, A)
    target_gt_idx = jnp.argmax(mask_pos, axis=1)  # (B, A)

    # gather targets via one-hot contractions: mask_pos has at most one gt
    # per anchor after conflict resolution, so a (B,M,A)x(B,M,*) einsum IS
    # the gather — vectorized/MXU work instead of the scalar-gather lowering
    # take_along_axis gets on TPU. Background anchors read zeros (the
    # take_along_axis form read gt row 0, a zero padding row in the empty-GT
    # case anyway); every consumer masks by fg/weight, and both overlap
    # kernels (eps-protected CIoU, det-clamped probIoU) keep zero boxes
    # backward-finite.
    mpos_f = mask_pos.astype(jnp.float32)
    # HIGHEST: these contractions ARE gathers — TPU default matmul precision
    # (bf16 operands) would quantize target coords by up to a few px at 640
    # and break exact label ids past nc=256; the contractions are tiny
    tgt_labels = jnp.einsum("bma,bm->ba", mpos_f, gt_labels.clip(0).astype(jnp.float32),
                            precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)  # (B, A)
    tgt_boxes = jnp.einsum("bma,bmf->baf", mpos_f, gt_boxes,
                           precision=jax.lax.Precision.HIGHEST)  # (B, A, F)
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
    return tgt_boxes, tgt_scores, fg_mask, target_gt_idx


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
    nc = pd_scores.shape[-1]

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
    gate = mask_in_gts & mask_gt[:, :, None]
    return _assign_from_align(align, overlaps, gate, gt_labels, gt_bboxes, nc, topk)


def _dfl_loss(pred_dist: jnp.ndarray, target: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """Distribution focal loss per element: pred_dist (..., 4, reg_max),
    target ltrb (..., 4) in grid units, already clamped to [0, reg_max-1)."""
    tl = jnp.floor(target)
    wr = target - tl
    wl = 1.0 - wr
    tr = jnp.minimum(tl + 1.0, reg_max - 1)
    logp = jax.nn.log_softmax(pred_dist, axis=-1)
    # gather-free: take_along_axis on the 16-wide minor axis lowers to scalar
    # gathers on TPU (measured 33.8 ms of the n/b32 loss forward,
    # tools/profile_loss.py); an interpolation-weight tensor turns it into
    # fully vectorized select+reduce that fuses with the log_softmax
    iota = jnp.arange(reg_max, dtype=pred_dist.dtype)
    w = wl[..., None] * (iota == tl[..., None]) + wr[..., None] * (iota == tr[..., None])
    return jnp.mean(-jnp.sum(logp * w, axis=-1), axis=-1)  # mean over 4 sides


def detection_loss(
    feats: List[jnp.ndarray],  # per-level (B, H, W, 4*reg_max+nc) raw head maps
    batch: Dict[str, jnp.ndarray],  # boxes (B,M,4) xyxy px, classes (B,M), mask (B,M)
    *,
    nc: int,
    reg_max: int = 16,
    strides: Sequence[int] = (8, 16, 32),
    hyp: Dict[str, float] = DEFAULT_HYP,
    return_aux: bool = False,
):
    """Total detection loss (scalar) + per-component metrics (+ assigner aux)."""
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
    ltrb = jnp.einsum("bafr,r->baf", probs, jnp.arange(reg_max, dtype=jnp.float32),
                      precision=jax.lax.Precision.HIGHEST)
    pred_boxes_grid = dist2bbox(ltrb, anchor_points[None])  # (B, A, 4) grid units
    pred_boxes_px = pred_boxes_grid * strd[None]

    # assigner runs DETACHED (ultralytics calls it under no_grad with
    # pred.detach() inputs): targets are constants w.r.t. the backward, and
    # stop_gradient here prunes the whole (B, M, A) CIoU/align subgraph from
    # the gradient program — it exists only in the (cheap) forward
    pd_scores = jax.nn.sigmoid(jax.lax.stop_gradient(cls_logits))
    tgt_bboxes_px, tgt_scores, fg_mask, _tgt_idx = task_aligned_assigner(
        pd_scores,
        jax.lax.stop_gradient(pred_boxes_px),
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
    if return_aux:
        aux = {
            "fg_mask": fg_mask,
            "target_gt_idx": _tgt_idx,
            "weight": weight,
            "tgt_scores_sum": tgt_scores_sum,
            "tgt_bboxes_px": tgt_bboxes_px,
            "anchor_points": anchor_points,
            "strd": strd,
        }
        return total, metrics, aux
    return total, metrics


def obb_loss(
    out: Dict[str, List[jnp.ndarray]],  # {'feats', 'angle'}
    batch: Dict[str, jnp.ndarray],  # boxes (B,M,5) cx,cy,w,h,rad px | classes | mask
    *,
    nc: int,
    reg_max: int = 16,
    strides: Sequence[int] = (8, 16, 32),
    hyp: Dict[str, float] = DEFAULT_HYP,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Oriented-box loss: TAL assignment under probIoU, probIoU box loss,
    DFL on rotated-frame distances, BCE cls. The rotated analog of
    detection_loss (no axis-aligned shortcut anywhere)."""
    from yolo_infer_tpu.ops.rotated import dist2rbox, probiou_pairs

    feats = out["feats"]
    b = feats[0].shape[0]
    feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchor_points, strd = make_anchors(feat_shapes, strides)
    flat = jnp.concatenate([f.reshape(b, -1, f.shape[-1]) for f in feats], axis=1).astype(jnp.float32)
    pred_dist_logits = flat[..., : 4 * reg_max]
    cls_logits = flat[..., 4 * reg_max :]
    a = flat.shape[1]

    ang = jnp.concatenate(
        [x.reshape(b, -1, x.shape[-1]) for x in out["angle"]], axis=1
    ).astype(jnp.float32)
    angle = (jax.nn.sigmoid(ang[..., 0]) - 0.25) * jnp.pi  # (B, A)

    dist = pred_dist_logits.reshape(b, a, 4, reg_max)
    probs = jax.nn.softmax(dist, axis=-1)
    ltrb = jnp.einsum("bafr,r->baf", probs, jnp.arange(reg_max, dtype=jnp.float32),
                      precision=jax.lax.Precision.HIGHEST)
    rb_grid = dist2rbox(ltrb, angle, anchor_points[None])  # (B, A, 4) grid units
    pred_rbox_px = jnp.concatenate([rb_grid * strd[None], angle[..., None]], axis=-1)  # (B,A,5)

    gt = batch["boxes"].astype(jnp.float32)  # (B, M, 5)
    gt_cls = batch["classes"].astype(jnp.int32)
    mask_gt = batch["mask"].astype(bool)
    m = gt.shape[1]
    # detached assigner, as in detection_loss (ultralytics no_grad semantics);
    # pred_rbox_px itself keeps grads — the probIoU box loss below needs them
    pd_scores = jax.nn.sigmoid(jax.lax.stop_gradient(cls_logits))
    pred_rbox_det = jax.lax.stop_gradient(pred_rbox_px)

    # anchors inside rotated gt: rotate anchor into the gt frame
    anc_px = (anchor_points * strd)  # (A, 2)
    dxy = anc_px[None, None, :, :] - gt[:, :, None, :2]  # (B, M, A, 2)
    cos = jnp.cos(gt[:, :, None, 4])
    sin = jnp.sin(gt[:, :, None, 4])
    lx = dxy[..., 0] * cos + dxy[..., 1] * sin
    ly = -dxy[..., 0] * sin + dxy[..., 1] * cos
    mask_in = (jnp.abs(lx) < gt[:, :, None, 2] / 2) & (jnp.abs(ly) < gt[:, :, None, 3] / 2)

    overlaps = probiou_pairs(
        jnp.broadcast_to(gt[:, :, None, :], (b, m, a, 5)),
        jnp.broadcast_to(pred_rbox_det[:, None, :, :], (b, m, a, 5)),
    ).clip(0)
    cls_scores = jnp.take_along_axis(pd_scores.transpose(0, 2, 1), gt_cls.clip(0)[:, :, None], axis=1)
    align = (cls_scores ** hyp.get("tal_alpha", 0.5)) * (overlaps ** hyp.get("tal_beta", 6.0))

    # shared TAL core (top-k gate, conflict resolution, one-hot gathers,
    # score normalization) — only the probIoU overlaps and the rotated-frame
    # in-gt gate differ from detection_loss. Background anchors read zero
    # rboxes; probIoU's determinant clamps keep those backward-finite, and
    # the box loss weight is 0 there.
    gate = mask_in & mask_gt[:, :, None]
    tgt_rbox, tgt_scores, fg, _tgt_idx = _assign_from_align(
        align, overlaps, gate, gt_cls, gt, nc, int(hyp.get("tal_topk", 10))
    )
    tss = jnp.maximum(jnp.sum(tgt_scores), 1.0)

    loss_cls = jnp.sum(optax_sigmoid_bce(cls_logits, tgt_scores)) / tss
    weight = jnp.sum(tgt_scores, axis=-1) * fg

    iou_pair = probiou_pairs(pred_rbox_px, tgt_rbox)
    loss_box = jnp.sum((1.0 - iou_pair) * weight) / tss

    # DFL target: anchor-to-edge distances in the GT's rotated frame
    tgt_grid = tgt_rbox.at[..., :4].divide(strd[None])  # cx,cy,w,h in grid units
    dxy_a = anchor_points[None] - tgt_grid[..., :2]
    cos_a = jnp.cos(tgt_rbox[..., 4])
    sin_a = jnp.sin(tgt_rbox[..., 4])
    lxa = dxy_a[..., 0] * cos_a + dxy_a[..., 1] * sin_a
    lya = -dxy_a[..., 0] * sin_a + dxy_a[..., 1] * cos_a
    half_w = tgt_grid[..., 2] / 2
    half_h = tgt_grid[..., 3] / 2
    tgt_ltrb = jnp.stack(
        [half_w + lxa, half_h + lya, half_w - lxa, half_h - lya], axis=-1
    ).clip(0, reg_max - 1 - 0.01)
    dfl = _dfl_loss(dist, tgt_ltrb, reg_max)
    loss_dfl = jnp.sum(dfl * weight) / tss

    total = (hyp["box"] * loss_box + hyp["cls"] * loss_cls + hyp["dfl"] * loss_dfl) * b
    return total, {
        "loss": total,
        "loss_box": loss_box,
        "loss_cls": loss_cls,
        "loss_dfl": loss_dfl,
        "num_fg": jnp.sum(fg.astype(jnp.int32)),
    }


# COCO-17 keypoint sigmas (OKS constants)
KPT_SIGMAS = jnp.asarray(
    [0.026, 0.025, 0.025, 0.035, 0.035, 0.079, 0.079, 0.072, 0.072,
     0.062, 0.062, 0.107, 0.107, 0.087, 0.087, 0.089, 0.089], jnp.float32
)


def segmentation_loss(
    out: Dict[str, List[jnp.ndarray]],  # {'feats', 'mc', 'proto'}
    batch: Dict[str, jnp.ndarray],  # + masks (B, Hm, Wm) int32 instance ids
    *,
    nc: int,
    reg_max: int = 16,
    strides: Sequence[int] = (8, 16, 32),
    hyp: Dict[str, float] = DEFAULT_HYP,
    mask_fg_cap: int = 160,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Detection losses + per-instance mask BCE (overlap-mask formulation).

    Fixed-shape: per image, the `mask_fg_cap` highest-weight foreground
    anchors contribute mask loss (TAL assigns <=10 anchors/gt, so the cap is
    rarely binding); each gets sigmoid(proto @ coefs) vs (mask == instance id),
    cropped to the target box and normalized by box area.
    """
    det_total, metrics, aux = detection_loss(
        out["feats"], batch, nc=nc, reg_max=reg_max, strides=strides, hyp=hyp, return_aux=True
    )
    proto = out["proto"].astype(jnp.float32)  # (B, Hm, Wm, nm)
    b_sz, hm, wm, nm = proto.shape
    mc = jnp.concatenate(
        [m.reshape(m.shape[0], -1, m.shape[-1]) for m in out["mc"]], axis=1
    ).astype(jnp.float32)  # (B, A, nm)
    a = mc.shape[1]
    f = min(mask_fg_cap, a)

    from yolo_infer_tpu.ops.nms import _exact_topk

    weight = aux["weight"]  # (B, A)
    top_w, top_idx = _exact_topk(weight, f)  # (B, F)
    coefs = jnp.take_along_axis(mc, top_idx[..., None], axis=1)  # (B, F, nm)
    pred = jnp.einsum("bhwn,bfn->bfhw", proto, coefs)  # (B, F, Hm, Wm) logits

    gid = jnp.take_along_axis(aux["target_gt_idx"], top_idx, axis=1) + 1  # (B, F)
    gt = (batch["masks"][:, None, :, :] == gid[:, :, None, None]).astype(jnp.float32)

    # crop to target box (letterbox px -> mask grid, stride 4)
    tb = jnp.take_along_axis(aux["tgt_bboxes_px"], top_idx[..., None], axis=1)  # (B, F, 4)
    tb_m = tb / 4.0
    ys = jnp.arange(hm, dtype=jnp.float32)[None, None, :, None]
    xs = jnp.arange(wm, dtype=jnp.float32)[None, None, None, :]
    in_box = (
        (xs >= tb_m[..., 0, None, None])
        & (xs < tb_m[..., 2, None, None])
        & (ys >= tb_m[..., 1, None, None])
        & (ys < tb_m[..., 3, None, None])
    ).astype(jnp.float32)

    bce = optax_sigmoid_bce(pred, gt) * in_box  # (B, F, Hm, Wm)
    area = jnp.maximum((tb_m[..., 2] - tb_m[..., 0]) * (tb_m[..., 3] - tb_m[..., 1]), 1.0)
    per_anchor = jnp.sum(bce, axis=(2, 3)) / area  # (B, F)
    valid = (top_w > 0).astype(jnp.float32)
    loss_mask = jnp.sum(per_anchor * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    total = det_total + hyp["box"] * loss_mask * out["feats"][0].shape[0]
    metrics = dict(metrics)
    metrics["loss_mask"] = loss_mask
    metrics["loss"] = total
    return total, metrics


def pose_loss(
    out: Dict[str, List[jnp.ndarray]],  # {'feats', 'kpts'}
    batch: Dict[str, jnp.ndarray],  # + kpts (B, M, K, 3) letterboxed px
    *,
    nc: int,
    reg_max: int = 16,
    strides: Sequence[int] = (8, 16, 32),
    hyp: Dict[str, float] = DEFAULT_HYP,
    pose_weight: float = 12.0,
    kobj_weight: float = 1.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Detection losses + OKS-style keypoint location loss + visibility BCE."""
    det_total, metrics, aux = detection_loss(
        out["feats"], batch, nc=nc, reg_max=reg_max, strides=strides, hyp=hyp, return_aux=True
    )
    b_sz = out["feats"][0].shape[0]
    kraw = jnp.concatenate(
        [k.reshape(k.shape[0], -1, k.shape[-1]) for k in out["kpts"]], axis=1
    ).astype(jnp.float32)  # (B, A, K*3)
    a = kraw.shape[1]
    k = batch["kpts"].shape[2]
    kraw = kraw.reshape(b_sz, a, k, 3)
    ap, strd = aux["anchor_points"], aux["strd"]  # grid units, (A,1)
    pred_xy = (kraw[..., :2] * 2.0 + (ap[None, :, None, :] - 0.5)) * strd[None, :, None, :]
    pred_conf = kraw[..., 2]

    tgt = jnp.take_along_axis(
        batch["kpts"].astype(jnp.float32), aux["target_gt_idx"][:, :, None, None], axis=1
    )  # (B, A, K, 3)
    vis = (tgt[..., 2] > 0).astype(jnp.float32)  # (B, A, K)
    fg = aux["fg_mask"].astype(jnp.float32)[:, :, None]

    tb = aux["tgt_bboxes_px"]
    area = jnp.maximum(
        (tb[..., 2] - tb[..., 0]) * (tb[..., 3] - tb[..., 1]), 1.0
    )[:, :, None]  # (B, A, 1)
    d2 = jnp.sum((pred_xy - tgt[..., :2]) ** 2, axis=-1)  # (B, A, K)
    sig = KPT_SIGMAS[:k][None, None, :]
    e = d2 / (8.0 * (sig**2) * area + 1e-9)
    w = vis * fg
    loss_kpt = jnp.sum((1.0 - jnp.exp(-e)) * w) / jnp.maximum(jnp.sum(w), 1.0)
    loss_kobj = jnp.sum(optax_sigmoid_bce(pred_conf, vis) * fg) / jnp.maximum(jnp.sum(fg) * k, 1.0)

    total = det_total + (pose_weight * loss_kpt + kobj_weight * loss_kobj) * b_sz
    metrics = dict(metrics)
    metrics["loss_kpt"] = loss_kpt
    metrics["loss_kobj"] = loss_kobj
    metrics["loss"] = total
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


# ------------------------------------------------------------- distillation
# Soft (teacher->student) losses for DistillationOptimizer. The reference
# declares distillation abstract with temperature=4.0 / alpha=0.7
# (reference optimization/base.py:290-314); the actual losses are new work.


def distill_classify_loss(s_logits: jnp.ndarray, t_logits: jnp.ndarray, temperature: float = 4.0) -> jnp.ndarray:
    """Hinton KD: T^2 * KL(softmax(t/T) || softmax(s/T)), mean over batch."""
    t = jax.nn.softmax(t_logits / temperature, axis=-1)
    logp_t = jax.nn.log_softmax(t_logits / temperature, axis=-1)
    logp_s = jax.nn.log_softmax(s_logits / temperature, axis=-1)
    kl = jnp.sum(t * (logp_t - logp_s), axis=-1)
    return temperature**2 * jnp.mean(kl)


def _binary_kl_from_logits(t_logits: jnp.ndarray, s_logits: jnp.ndarray) -> jnp.ndarray:
    """KL(sigmoid(t) || sigmoid(s)) per element, via stable BCE identities:
    KL(p||q) = H(p, q) - H(p) with H(p, sigmoid(l)) = BCE(l, p)."""
    p = jax.nn.sigmoid(t_logits)
    return optax_sigmoid_bce(s_logits, p) - optax_sigmoid_bce(t_logits, p)


def distill_detect_loss(
    s_feats: List[jnp.ndarray],
    t_feats: List[jnp.ndarray],
    *,
    nc: int,
    reg_max: int = 16,
    temperature: float = 4.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Soft KD loss between student and teacher raw detect-head maps.

    Every YOLO11 size emits the same head layout — per level
    (B, Hi, Wi, 4*reg_max + nc) at strides 8/16/32 — so teacher and student
    predictions align per anchor regardless of backbone width. Two terms:

      * cls — temperature-scaled binary KL between per-class sigmoid
        probabilities over ALL anchors (background "dark knowledge" teaches
        the student what to suppress), normalized like the hard BCE.
      * box — KL between the DFL bin distributions (softmax over reg_max per
        side), weighted by the teacher's own per-anchor confidence: box
        distributions on background anchors are noise, so they get ~0 weight.

    Both terms carry the classic T^2 gradient rescale.
    """
    b = s_feats[0].shape[0]
    s_flat = jnp.concatenate([f.reshape(b, -1, f.shape[-1]) for f in s_feats], axis=1).astype(jnp.float32)
    t_flat = jnp.concatenate([f.reshape(b, -1, f.shape[-1]) for f in t_feats], axis=1).astype(jnp.float32)
    s_cls, t_cls = s_flat[..., 4 * reg_max:], t_flat[..., 4 * reg_max:]
    s_box = s_flat[..., : 4 * reg_max].reshape(b, -1, 4, reg_max)
    t_box = t_flat[..., : 4 * reg_max].reshape(b, -1, 4, reg_max)

    # cls: mean binary KL at temperature T, per anchor-class
    kd_cls = temperature**2 * jnp.mean(
        jnp.sum(_binary_kl_from_logits(t_cls / temperature, s_cls / temperature), axis=-1)
    )

    # box: DFL distribution KL, teacher-confidence weighted
    w = jnp.max(jax.nn.sigmoid(t_cls), axis=-1)  # (B, A) teacher objectness proxy
    w = w / jnp.maximum(jnp.sum(w), 1e-6)
    p_t = jax.nn.softmax(t_box / temperature, axis=-1)
    logp_t = jax.nn.log_softmax(t_box / temperature, axis=-1)
    logp_s = jax.nn.log_softmax(s_box / temperature, axis=-1)
    kl_box = jnp.mean(jnp.sum(p_t * (logp_t - logp_s), axis=-1), axis=-1)  # (B, A)
    kd_box = temperature**2 * jnp.sum(kl_box * w)

    total = kd_cls + kd_box
    return total, {"kd_cls": kd_cls, "kd_box": kd_box}
