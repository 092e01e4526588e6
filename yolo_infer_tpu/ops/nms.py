"""Batched fixed-shape class-aware NMS for TPU.

The reference relies on torchvision's C++/CUDA `nms` with dynamic output
shapes (SURVEY.md §2b). Dynamic shapes don't exist under XLA, so this is the
TPU-native recast (SURVEY.md §7 step 3): score top-k to a static candidate
count, an O(K²) IoU matrix, and greedy suppression computed as a fixpoint
iteration — each sweep is pure vector/matrix work on the VPU, and the number
of sweeps needed equals the longest suppression chain (usually < 10), not K.

Greedy-equivalence: with candidates sorted by descending score, define
  f(kept)[j] = valid[j] and not any_i (i<j and kept[i] and iou[i,j] > t).
Sequential greedy NMS is the unique fixpoint of f reached from kept=valid;
after `n` sweeps every box whose suppression chain is shorter than `n` has
its final value, so iterating to stability (capped at K sweeps) is exact.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

from yolo_infer_tpu.ops.iou import box_iou_matrix

MAX_WH = 7680.0  # class-offset stride for class-aware suppression


def _nms_fixpoint(iou: jnp.ndarray, valid: jnp.ndarray, iou_thres: jnp.ndarray, max_sweeps: int) -> jnp.ndarray:
    """Greedy NMS keep-mask over score-sorted candidates via fixpoint sweeps."""
    k = iou.shape[0]
    higher = jnp.triu(jnp.ones((k, k), dtype=bool), k=1)  # higher[i, j]: i outranks j
    overlap = (iou > iou_thres) & higher

    def cond(carry):
        _, changed, it = carry
        return changed & (it < max_sweeps)

    def body(carry):
        kept, _, it = carry
        suppressed = jnp.any(overlap & kept[:, None], axis=0)
        new_kept = valid & ~suppressed
        return new_kept, jnp.any(new_kept != kept), it + 1

    kept, _, _ = lax.while_loop(cond, body, (valid, jnp.array(True), jnp.array(0)))
    return kept


def _single_nms(
    boxes: jnp.ndarray,  # (A, 4) xyxy
    scores: jnp.ndarray,  # (A, nc)
    conf_thres: jnp.ndarray,
    iou_thres: jnp.ndarray,
    *,
    pre_topk: int,
    max_det: int,
    class_aware: bool,
    multi_label: bool,
    multi_label_topc: int = 8,
) -> Dict[str, jnp.ndarray]:
    a, nc = scores.shape
    if multi_label and nc > 1:
        # Per-anchor class cap before the flat sort: the raw (A*nc,) pool is
        # 672k at nc=80 and its exact top-k costs 15.7 ms/b16-batch in
        # isolation — the val program's dominant op. Keeping each anchor's
        # top-C classes first shrinks the big sort 10x (the _topc_per_anchor
        # reduction itself is sort-free: 2.0 ms vs 15.7, 7.8x,
        # tools/bench_topc_impls.py 2026-08-19).
        # Semantics: drops an (anchor, class) pair only when ONE anchor has
        # more than C classes inside the global top-pre_topk — the same
        # fixed-cap trade the verified pre_topk cap already makes (mAP
        # identical across caps and across C, tests/test_nms.py dense-regime
        # tests). C >= nc disables the reduction.
        c = multi_label_topc
        if c < nc:
            cls_scores, cls_idx = _topc_per_anchor(scores, c)  # (A, c)
            flat = cls_scores.reshape(-1)  # (A*c,)
            cand = jnp.where(flat > conf_thres, flat, -1.0)
            k = min(pre_topk, a * c)
            top_scores, top_idx = _exact_topk(cand, k)
            anchor_idx = top_idx // c
            cls = cls_idx.reshape(-1)[top_idx].astype(jnp.float32)
        else:
            flat = scores.reshape(-1)  # (A*nc,)
            cand = jnp.where(flat > conf_thres, flat, -1.0)
            k = min(pre_topk, a * nc)
            top_scores, top_idx = _exact_topk(cand, k)
            anchor_idx = top_idx // nc
            cls = (top_idx % nc).astype(jnp.float32)
        cboxes = boxes[anchor_idx]
        cand_anchor = anchor_idx
    else:
        best = jnp.max(scores, axis=-1)
        cls_best = jnp.argmax(scores, axis=-1).astype(jnp.float32)
        cand = jnp.where(best > conf_thres, best, -1.0)
        k = min(pre_topk, a)
        top_scores, top_idx = _exact_topk(cand, k)
        cls = cls_best[top_idx]
        cboxes = boxes[top_idx]
        cand_anchor = top_idx

    valid = top_scores > 0
    sup_boxes = cboxes + (cls[:, None] * MAX_WH if class_aware else 0.0)
    iou = box_iou_matrix(sup_boxes, sup_boxes)
    kept = _nms_fixpoint(iou, valid, iou_thres, max_sweeps=k)

    final = jnp.where(kept, top_scores, -1.0)
    if k < max_det:  # fewer candidates than output slots: pad before top_k
        pad = max_det - k
        final = jnp.concatenate([final, jnp.full((pad,), -1.0)])
        cboxes = jnp.concatenate([cboxes, jnp.zeros((pad, 4))])
        cls = jnp.concatenate([cls, jnp.zeros((pad,))])
        cand_anchor = jnp.concatenate([cand_anchor, jnp.zeros((pad,), cand_anchor.dtype)])
    out_scores, sel = lax.top_k(final, max_det)
    out_valid = out_scores > 0
    z = jnp.float32(0)
    return {
        "boxes": jnp.where(out_valid[:, None], cboxes[sel], z),
        "scores": jnp.where(out_valid, out_scores, z),
        "classes": jnp.where(out_valid, cls[sel], -1.0),
        "valid": out_valid,
        "num": jnp.sum(out_valid.astype(jnp.int32)),
        "anchor_idx": jnp.where(out_valid, cand_anchor[sel], 0).astype(jnp.int32),
    }


@partial(jax.jit, static_argnames=("pre_topk", "max_det", "class_aware", "multi_label", "multi_label_topc"))
def batched_nms(
    boxes: jnp.ndarray,  # (B, A, 4) xyxy, letterboxed pixels
    scores: jnp.ndarray,  # (B, A, nc) sigmoided
    conf_thres=0.25,
    iou_thres=0.45,
    *,
    pre_topk: int = 1024,
    max_det: int = 300,
    class_aware: bool = True,
    multi_label: bool = False,
    multi_label_topc: int = 8,
) -> Dict[str, jnp.ndarray]:
    """Class-aware greedy NMS over a batch. All outputs have static shapes:

    boxes (B, max_det, 4), scores (B, max_det), classes (B, max_det),
    valid (B, max_det) bool, num (B,) int32. Invalid slots are zero/-1.

    `conf_thres`/`iou_thres` are traced scalars — changing them does NOT
    recompile. `pre_topk`/`max_det` are static.
    """
    conf_thres = jnp.asarray(conf_thres, jnp.float32)
    iou_thres = jnp.asarray(iou_thres, jnp.float32)
    fn = partial(
        _single_nms,
        pre_topk=pre_topk,
        max_det=max_det,
        class_aware=class_aware,
        multi_label=multi_label,
        multi_label_topc=multi_label_topc,
    )
    return jax.vmap(lambda b, s: fn(b, s, conf_thres, iou_thres))(
        boxes.astype(jnp.float32), scores.astype(jnp.float32)
    )


def _on_tpu() -> bool:
    """Trace-time backend probe (the axon tunnel reports platform 'axon')."""
    try:
        dev = jax.devices()[0]
        return "tpu" in dev.platform.lower() or "tpu" in getattr(dev, "device_kind", "").lower()
    except Exception:  # pragma: no cover - no backend at all
        return False


def _multi_label_topc() -> int:
    """Per-anchor class cap for multi-label NMS (val protocol).

    8 keeps every (anchor, class) pair unless a single anchor carries more
    than 8 classes inside the global top-pre_topk pool — unobserved on the
    randomized dense scenes of the cap-insensitivity tests. Env override
    `YOLO_MULTI_LABEL_TOPC` (set >= nc, e.g. 1000, to disable)."""
    import os

    return int(os.environ.get("YOLO_MULTI_LABEL_TOPC", "8"))


def _topc_per_anchor(scores: jnp.ndarray, c: int) -> tuple:
    """Top-C (values, indices) along the last axis WITHOUT a sort.

    C rounds of max/argmax + one-hot masking — pure VPU passes over the
    (..., nc) block. XLA lowers rowwise ``lax.top_k`` to a full variadic
    sort of the same (value, index) pairs, which costs ~1.5x this; the flat
    exact top-k over A*nc that this reduction feeds-and-shrinks costs ~8x
    (isolated at (16, 8400, 80)->C=8 pre_topk=4096: itermax 2.0 ms, rowwise
    top_k 3.1, flat 15.7 — tools/bench_topc_impls.py, v5e 2026-08-19).
    Values descend along the C axis; ties resolve to the lowest class index
    (argmax semantics), matching ``lax.top_k``.
    """
    cols = lax.broadcasted_iota(jnp.int32, scores.shape[-1:], 0)  # (nc,)
    vals, idxs = [], []
    cur = scores
    for _ in range(c):
        i = jnp.argmax(cur, axis=-1)
        vals.append(jnp.max(cur, axis=-1))
        idxs.append(i)
        cur = jnp.where(cols == i[..., None], -jnp.inf, cur)
    return jnp.stack(vals, -1), jnp.stack(idxs, -1)


def _exact_topk(cand: jnp.ndarray, k: int, impl: str = "auto") -> tuple:
    """Exact descending top-k over the last axis.

    On TPU, lax.top_k lowers to a full variadic sort (1.6 ms at (128, 8400)
    on v5e-1); lax.approx_max_k with recall_target=1.0 uses the ApproxTopK
    partial-reduce custom call, which is exact at recall 1.0 and measured
    faster (tools/profile_tail.py). Equal scores may order differently than
    top_k's index tie-break — immaterial post-NMS. Override with
    YOLO_TOPK_IMPL=sort.
    """
    import os

    if impl != "xla" and _on_tpu() and os.environ.get("YOLO_TOPK_IMPL", "auto") != "sort":
        return lax.approx_max_k(cand, k, recall_target=1.0)
    return lax.top_k(cand, k)


def nms_keep_mask(sup_boxes: jnp.ndarray, valid: jnp.ndarray, iou_thres: jnp.ndarray, k: int, impl: str = "auto") -> jnp.ndarray:
    """Greedy-NMS keep mask over (B, K) score-sorted candidates.

    On TPU this runs the fused Pallas kernel (IoU matrix + fixpoint sweeps
    VMEM-resident, no (B, K, K) HBM round trip — ops/pallas/nms_fused.py);
    elsewhere the XLA fixpoint. Both compute the identical keep mask.
    impl="xla" forces the fixpoint — required under a GSPMD mesh, where a
    pallas_call has no partitioning rule and would be replicated per chip.
    Override globally with YOLO_NMS_IMPL=xla | pallas (on non-TPU backends
    `pallas` runs the kernel in interpret mode). Both the env var and the
    backend probe are read at TRACE time: once a jitted caller has compiled,
    toggling the env has no effect until a fresh signature recompiles.
    """
    import os

    env = os.environ.get("YOLO_NMS_IMPL", "auto")
    if impl != "xla" and env != "xla" and (impl == "pallas" or env == "pallas" or _on_tpu()):
        from yolo_infer_tpu.ops.pallas.nms_fused import nms_keep_pallas

        return nms_keep_pallas(sup_boxes, valid, iou_thres, interpret=not _on_tpu())

    def one(bx, va):
        return _nms_fixpoint(box_iou_matrix(bx, bx), va, iou_thres, max_sweeps=k)

    return jax.vmap(one)(sup_boxes, valid)


@partial(jax.jit, static_argnames=("pre_topk", "max_det", "class_aware", "impl"))
def batched_nms_presel(
    boxes: jnp.ndarray,  # (B, A, 4) xyxy
    best: jnp.ndarray,  # (B, A) best-class scores (sigmoided)
    cls: jnp.ndarray,  # (B, A) best-class ids (float)
    conf_thres=0.25,
    iou_thres=0.45,
    *,
    pre_topk: int = 512,
    max_det: int = 300,
    class_aware: bool = True,
    impl: str = "auto",  # "xla" forces sort+fixpoint (meshed serving)
) -> Dict[str, jnp.ndarray]:
    """Single-label NMS over pre-reduced (best, cls) — pairs with
    ops.decode.decode_for_nms, which reduces classes per level.

    Batched end to end (no vmap): exact ApproxTopK candidate selection and
    the fused Pallas keep kernel on TPU (see _exact_topk / nms_keep_mask).
    """
    conf_thres = jnp.asarray(conf_thres, jnp.float32)
    iou_thres = jnp.asarray(iou_thres, jnp.float32)
    boxes = boxes.astype(jnp.float32)
    best = best.astype(jnp.float32)
    cls = cls.astype(jnp.float32)
    a = best.shape[1]
    k = min(pre_topk, a)
    cand = jnp.where(best > conf_thres, best, -1.0)
    top_scores, top_idx = _exact_topk(cand, k, impl)
    cboxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
    ccls = jnp.take_along_axis(cls, top_idx, axis=1)
    return _presel_finish(cboxes, ccls, top_scores, top_idx, iou_thres,
                          max_det=max_det, class_aware=class_aware, impl=impl)


def _presel_finish(cboxes, ccls, top_scores, top_idx, iou_thres, *, max_det, class_aware, impl):
    """Shared back half of the single-label NMS paths: keep-mask over the
    score-sorted (B, K) candidates, then the fixed max_det output layout."""
    b, k = top_scores.shape
    valid = top_scores > 0
    sup_boxes = cboxes + (ccls[..., None] * MAX_WH if class_aware else 0.0)
    kept = nms_keep_mask(sup_boxes, valid, iou_thres, k, impl)
    final = jnp.where(kept, top_scores, -1.0)
    if k < max_det:  # fewer candidates than output slots: pad before top_k
        pad = max_det - k
        final = jnp.concatenate([final, jnp.full((b, pad), -1.0)], axis=1)
        cboxes = jnp.concatenate([cboxes, jnp.zeros((b, pad, 4))], axis=1)
        ccls = jnp.concatenate([ccls, jnp.zeros((b, pad))], axis=1)
        top_idx = jnp.concatenate([top_idx, jnp.zeros((b, pad), top_idx.dtype)], axis=1)
    out_scores, sel = lax.top_k(final, max_det)
    out_valid = out_scores > 0
    z = jnp.float32(0)
    return {
        "boxes": jnp.where(out_valid[..., None], jnp.take_along_axis(cboxes, sel[..., None], axis=1), z),
        "scores": jnp.where(out_valid, out_scores, z),
        "classes": jnp.where(out_valid, jnp.take_along_axis(ccls, sel, axis=1), -1.0),
        "valid": out_valid,
        "num": jnp.sum(out_valid.astype(jnp.int32), axis=1),
        "anchor_idx": jnp.where(out_valid, jnp.take_along_axis(top_idx, sel, axis=1), 0).astype(jnp.int32),
    }


@partial(jax.jit, static_argnames=("feat_shapes", "strides", "reg_max", "pre_topk", "max_det", "class_aware", "impl"))
def batched_nms_seldec(
    box_dist: jnp.ndarray,  # (B, A, 4*reg_max) RAW head dist logits (any float dtype)
    best: jnp.ndarray,  # (B, A) best-class scores (sigmoided)
    cls: jnp.ndarray,  # (B, A) best-class ids (float)
    conf_thres=0.25,
    iou_thres=0.45,
    *,
    feat_shapes,  # ((h, w), ...) per level — static
    strides=(8, 16, 32),
    reg_max: int = 16,
    pre_topk: int = 512,
    max_det: int = 300,
    class_aware: bool = True,
    impl: str = "auto",
) -> Dict[str, jnp.ndarray]:
    """Select-then-decode single-label NMS (pairs with decode_scores_raw).

    Candidate selection runs on scores alone; the DFL softmax-expectation —
    the divide/multiply family the round-4 b32 device trace attributed
    ~0.67 ms/chunk to when it ran over all A anchors — decodes only the
    pre_topk selected rows. The (B, A, 64) raw dist rows are pulled with the
    one-hot MXU contraction (ops/select.py: a 64-wide take_along_axis is the
    scalar-gather regime), anchor points/strides come from pure index math
    (ops.decode.anchor_rows_from_idx), and box math matches decode_for_nms:
    bf16 DFL expectation, f32 dist2bbox-times-stride.
    """
    from yolo_infer_tpu.ops.decode import anchor_rows_from_idx, dfl_expectation, dist2bbox
    from yolo_infer_tpu.ops.select import select_anchor_rows

    conf_thres = jnp.asarray(conf_thres, jnp.float32)
    iou_thres = jnp.asarray(iou_thres, jnp.float32)
    best = best.astype(jnp.float32)
    cls = cls.astype(jnp.float32)
    a = best.shape[1]
    k = min(pre_topk, a)
    cand = jnp.where(best > conf_thres, best, -1.0)
    top_scores, top_idx = _exact_topk(cand, k, impl)
    sel_dist = select_anchor_rows(box_dist, top_idx)  # (B, K, 4*reg_max)
    ap, st = anchor_rows_from_idx(top_idx, feat_shapes, strides)
    dist = dfl_expectation(sel_dist, reg_max, dtype=sel_dist.dtype)
    cboxes = dist2bbox(dist, ap) * st
    ccls = jnp.take_along_axis(cls, top_idx, axis=1)
    return _presel_finish(cboxes, ccls, top_scores, top_idx, iou_thres,
                          max_det=max_det, class_aware=class_aware, impl=impl)


@partial(jax.jit, static_argnames=("pre_topk", "max_det", "class_aware", "impl"))
def batched_nms_from_logits(
    boxes: jnp.ndarray,  # (B, A, 4) xyxy
    cls_logits: jnp.ndarray,  # (B, A, nc) RAW logits (any float dtype)
    conf_thres=0.25,
    iou_thres=0.45,
    *,
    pre_topk: int = 1024,
    max_det: int = 300,
    class_aware: bool = True,
    impl: str = "auto",
) -> Dict[str, jnp.ndarray]:
    """Single-label NMS straight from logits.

    sigmoid is monotone, so best-class selection happens on the raw (bf16)
    logits and sigmoid is applied to ONE scalar per anchor — the full
    (B, A, nc) fp32 score tensor is never materialized (bandwidth win on the
    decode tail; ~80x less sigmoid traffic at nc=80).
    """
    best_logit = jnp.max(cls_logits, axis=-1)
    cls = jnp.argmax(cls_logits, axis=-1).astype(jnp.float32)
    best = jax.nn.sigmoid(best_logit.astype(jnp.float32))
    return batched_nms_presel(
        boxes, best, cls, conf_thres, iou_thres,
        pre_topk=pre_topk, max_det=max_det, class_aware=class_aware, impl=impl,
    )


def nms_numpy_reference(boxes, scores, iou_thres):
    """O(K²) sequential greedy NMS on host — the oracle for tests."""
    import numpy as np

    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for pos, i in enumerate(order):
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order[pos + 1 :]:
            if suppressed[j]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
            area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            area_j = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            iou = inter / (area_i + area_j - inter + 1e-7)
            if iou > iou_thres:
                suppressed[j] = True
    return np.array(keep, dtype=np.int64)
