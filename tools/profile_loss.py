#!/usr/bin/env python
"""Sub-stage attribution for the detection loss forward (train bottleneck).

profile_train.py showed the loss forward (TAL assigner + losses) costs ~3x
the model forward at n/b32. This drills in: nested prefixes of the loss
computation, each jitted separately with materialized outputs (DCE-proof),
on the REAL head maps produced by the model forward (so layouts match the
training graph).

Stages (cumulative):
  head      model forward only (baseline to subtract)
  decode    + flatten/softmax/einsum DFL expectation + dist2bbox
  overlaps  + the (B, M, A) pairwise CIoU + in-gt gating
  assign    + top-k, conflict resolution, target gather/normalize
  bce       + full-map sigmoid BCE (B, A, nc)
  full      + CIoU box loss + DFL loss (== detection_loss)

PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_loss.py
env: SIZE=n B=32 IMGSZ=640 RUNS=10
"""

import json
import os
import sys
import time

import numpy as np


def sync(x):
    import jax

    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def bench(fn, args, runs):
    t0 = time.perf_counter()
    out = fn(*args)
    sync(out)
    compile_s = time.perf_counter() - t0
    for _ in range(2):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / runs * 1e3, compile_s


def main():
    import jax
    import jax.numpy as jnp

    from yolo_infer_tpu.core.losses import (
        DEFAULT_HYP,
        EPS,
        _dfl_loss,
        detection_loss,
        optax_sigmoid_bce,
        task_aligned_assigner,
    )
    from yolo_infer_tpu.models.yolo11 import build_model, forward
    from yolo_infer_tpu.ops.decode import dist2bbox, make_anchors
    from yolo_infer_tpu.ops.iou import bbox_iou_aligned
    from yolo_infer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    size = os.environ.get("SIZE", "n")
    b = int(os.environ.get("B", "32"))
    imgsz = int(os.environ.get("IMGSZ", "640"))
    runs = int(os.environ.get("RUNS", "10"))

    params, bn, spec = build_model(jax.random.PRNGKey(0), "detect", size, 80)
    rng = np.random.default_rng(0)
    m = 32
    batch = {
        "boxes": jnp.asarray(rng.uniform(0, imgsz, (b, m, 4)).astype(np.float32)),
        "classes": jnp.asarray(rng.integers(0, 80, (b, m)).astype(np.float32)),
        "mask": jnp.asarray(np.ones((b, m), np.float32)),
    }
    images = jnp.asarray(rng.random((b, imgsz, imgsz, 3), np.float32))
    nc, reg_max, strides = spec.nc, spec.reg_max, spec.strides
    hyp = DEFAULT_HYP

    def head(params, bn, images):
        out, _ = forward(params, bn, spec, images, training=True, compute_dtype=jnp.bfloat16)
        return [f.astype(jnp.float32) for f in out["feats"]]

    def _decode(feats):
        bsz = feats[0].shape[0]
        feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchor_points, strd = make_anchors(feat_shapes, strides)
        flat = jnp.concatenate([f.reshape(bsz, -1, f.shape[-1]) for f in feats], axis=1)
        pred_dist_logits = flat[..., : 4 * reg_max]
        cls_logits = flat[..., 4 * reg_max :]
        a = flat.shape[1]
        dist = pred_dist_logits.reshape(bsz, a, 4, reg_max)
        probs = jax.nn.softmax(dist, axis=-1)
        ltrb = jnp.einsum("bafr,r->baf", probs, jnp.arange(reg_max, dtype=jnp.float32))
        pred_boxes_grid = dist2bbox(ltrb, anchor_points[None])
        return dist, cls_logits, pred_boxes_grid, anchor_points, strd

    def stage_decode(params, bn, images):
        dist, cls_logits, pbg, ap, strd = _decode(head(params, bn, images))
        return dist.sum() + cls_logits.sum() + pbg.sum()

    def _overlaps(cls_logits, pred_boxes_px, anc_px, batch):
        gt_bboxes = batch["boxes"]
        lt = anc_px[None, None, :, :] - gt_bboxes[:, :, None, :2]
        rb = gt_bboxes[:, :, None, 2:] - anc_px[None, None, :, :]
        mask_in_gts = jnp.min(jnp.concatenate([lt, rb], axis=-1), axis=-1) > EPS
        overlaps = bbox_iou_aligned(
            gt_bboxes[:, :, None, :], pred_boxes_px[:, None, :, :], kind="ciou"
        ).clip(0)
        pd_scores = jax.nn.sigmoid(cls_logits)
        cls_sc = jnp.take_along_axis(
            pd_scores.transpose(0, 2, 1), batch["classes"].astype(jnp.int32).clip(0)[:, :, None], axis=1
        )
        align = (cls_sc**0.5) * (overlaps**6.0)
        return mask_in_gts, overlaps, align

    def stage_overlaps(params, bn, images, batch):
        dist, cls_logits, pbg, ap, strd = _decode(head(params, bn, images))
        mig, ovl, align = _overlaps(cls_logits, pbg * strd[None], ap * strd, batch)
        return ovl.sum() + align.sum() + mig.sum()

    def stage_assign(params, bn, images, batch):
        dist, cls_logits, pbg, ap, strd = _decode(head(params, bn, images))
        tb, ts_, fg, ti = task_aligned_assigner(
            jax.nn.sigmoid(cls_logits), pbg * strd[None], ap * strd,
            batch["classes"].astype(jnp.int32), batch["boxes"], batch["mask"].astype(bool),
        )
        return tb.sum() + ts_.sum() + fg.sum() + ti.sum()

    def stage_bce(params, bn, images, batch):
        dist, cls_logits, pbg, ap, strd = _decode(head(params, bn, images))
        tb, ts_, fg, ti = task_aligned_assigner(
            jax.nn.sigmoid(cls_logits), pbg * strd[None], ap * strd,
            batch["classes"].astype(jnp.int32), batch["boxes"], batch["mask"].astype(bool),
        )
        return jnp.sum(optax_sigmoid_bce(cls_logits, ts_)) + tb.sum() + fg.sum()

    def stage_full(params, bn, images, batch):
        feats = head(params, bn, images)
        loss, _ = detection_loss(feats, batch, nc=nc, reg_max=reg_max, strides=strides, hyp=hyp)
        return loss

    def stage_head(params, bn, images):
        return sum(f.sum() for f in head(params, bn, images))

    defs = [
        ("head", jax.jit(stage_head), (params, bn, images)),
        ("decode", jax.jit(stage_decode), (params, bn, images)),
        ("overlaps", jax.jit(stage_overlaps), (params, bn, images, batch)),
        ("assign", jax.jit(stage_assign), (params, bn, images, batch)),
        ("bce", jax.jit(stage_bce), (params, bn, images, batch)),
        ("full", jax.jit(stage_full), (params, bn, images, batch)),
    ]
    res, prev = [], 0.0
    for name, fn, args in defs:
        ms, compile_s = bench(fn, args, runs)
        rec = {"stage": name, "cum_ms": round(ms, 2), "marginal_ms": round(ms - prev, 2),
               "compile_s": round(compile_s, 1)}
        prev = ms
        res.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"size": size, "batch": b, "imgsz": imgsz, "stages": res}))


if __name__ == "__main__":
    sys.exit(main())
