#!/usr/bin/env python
"""Decompose the decode+NMS tail at yolo11n@b128 shapes on the real TPU.

PERF_MATRIX.json puts the tail at 6.7 ms of the 22.9 ms b128 e2e (29%).
This microbenchmarks each tail component in its own jit (chained runs, one
sync — per CLAUDE.md the per-dispatch tunnel floor makes per-call timing
meaningless) to find where those milliseconds actually go, and times the
candidate optimizations:

  - lax.top_k vs lax.approx_max_k (TPU ApproxTopK partial-reduce; exact at
    recall_target=1.0) on the (B, A) score reduction
  - candidates-first decode: top-k on raw logits, then DFL only on the K
    selected anchors (16x less DFL work than decoding all 8400)

PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_tail.py
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np


def sync_leaf(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def bench(fn, args, runs=30):
    out = fn(*args)
    sync_leaf(out)
    for _ in range(3):
        out = fn(*args)
    sync_leaf(out)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
    sync_leaf(out)
    return (time.perf_counter() - t0) / runs * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from yolo_infer_tpu.ops.decode import decode_for_nms, dfl_expectation, dist2bbox, make_anchors
    from yolo_infer_tpu.ops.iou import box_iou_matrix
    from yolo_infer_tpu.ops.nms import _nms_fixpoint, batched_nms_presel

    b = int(os.environ.get("B", "128"))
    imgsz = int(os.environ.get("IMGSZ", "640"))
    nc, reg_max = 80, 16
    strides = (8, 16, 32)
    k = int(os.environ.get("K", "512"))
    rng = np.random.default_rng(0)

    feats = [
        jnp.asarray(rng.standard_normal((b, imgsz // s, imgsz // s, 4 * reg_max + nc)) * 2 - 6, jnp.bfloat16)
        for s in strides
    ]
    a_total = sum((imgsz // s) ** 2 for s in strides)
    res = {"batch": b, "A": a_total, "K": k, "device": str(jax.devices()[0])}

    # --- current production tail, whole ---
    @jax.jit
    def tail_now(fs):
        boxes, best, cls = decode_for_nms(fs, nc, reg_max, strides)
        return batched_nms_presel(boxes, best, cls, 0.25, 0.45, pre_topk=k, max_det=300)

    res["tail_now_ms"] = bench(tail_now, (feats,))

    # --- decode_for_nms alone ---
    res["decode_for_nms_ms"] = bench(jax.jit(lambda fs: decode_for_nms(fs, nc, reg_max, strides)), (feats,))

    # --- decode pieces ---
    @jax.jit
    def reduce_only(fs):
        outs = []
        for f in fs:
            cl = f[..., 4 * reg_max:]
            outs.append((jnp.max(cl, axis=-1), jnp.argmax(cl, axis=-1)))
        return outs

    res["cls_reduce_ms"] = bench(reduce_only, (feats,))

    @jax.jit
    def dfl_only(fs):
        outs = []
        for f, s in zip(fs, strides):
            bb, h, w, _ = f.shape
            bd = f[..., : 4 * reg_max].reshape(bb, h * w, 4 * reg_max)
            d = dfl_expectation(bd, reg_max, dtype=bd.dtype)
            ap, _ = make_anchors([(h, w)], [s])
            outs.append(dist2bbox(d, ap[None]) * float(s))
        return outs

    res["dfl_all_anchors_ms"] = bench(dfl_only, (feats,))

    # --- top-k variants on (B, A) ---
    best_host = rng.standard_normal((b, a_total)).astype(np.float32)
    best_f32 = jnp.asarray(best_host)
    best_bf16 = best_f32.astype(jnp.bfloat16)

    res["topk_sort_f32_ms"] = bench(jax.jit(lambda s: lax.top_k(s, k)), (best_f32,))
    res["approx_topk_r1.0_f32_ms"] = bench(
        jax.jit(lambda s: lax.approx_max_k(s, k, recall_target=1.0)), (best_f32,))
    res["approx_topk_r0.95_f32_ms"] = bench(
        jax.jit(lambda s: lax.approx_max_k(s, k, recall_target=0.95)), (best_f32,))
    try:
        res["approx_topk_r1.0_bf16_ms"] = bench(
            jax.jit(lambda s: lax.approx_max_k(s, k, recall_target=1.0)), (best_bf16,))
    except Exception as e:  # noqa: BLE001
        res["approx_topk_bf16_error"] = str(e)[:100]

    # exactness check (host): approx_max_k at recall 1.0 vs top_k
    v1, i1 = jax.jit(lambda s: lax.top_k(s, k))(best_f32)
    v2, i2 = jax.jit(lambda s: lax.approx_max_k(s, k, recall_target=1.0))(best_f32)
    res["approx_r1.0_exact"] = bool(np.array_equal(np.sort(np.asarray(i1)), np.sort(np.asarray(i2))))

    # --- iou + fixpoint on (B, K, K) ---
    cbox_host = rng.uniform(0, imgsz, (b, k, 4)).astype(np.float32)
    cboxes = jnp.asarray(np.concatenate([
        np.minimum(cbox_host[..., :2], cbox_host[..., 2:]),
        np.maximum(cbox_host[..., :2], cbox_host[..., 2:]) + 4.0,
    ], axis=-1))
    valid = jnp.asarray(rng.uniform(size=(b, k)) < 0.3)

    @jax.jit
    def iou_fix(bx, va):
        def one(bxi, vai):
            iou = box_iou_matrix(bxi, bxi)
            return _nms_fixpoint(iou, vai, jnp.float32(0.45), max_sweeps=k)
        return jax.vmap(one)(bx, va)

    res["iou_fixpoint_ms"] = bench(iou_fix, (cboxes, valid))

    @jax.jit
    def iou_only(bx):
        return jax.vmap(lambda bxi: box_iou_matrix(bxi, bxi))(bx)

    res["iou_matrix_ms"] = bench(iou_only, (cboxes,))

    # --- candidates-first tail: topk on logits, DFL on K only ---
    @partial(jax.jit, static_argnames=())
    def tail_candfirst(fs):
        best_l, cls_l, bd_l = [], [], []
        for f in fs:
            bb, h, w, _ = f.shape
            cl = f[..., 4 * reg_max:]
            best_l.append(jnp.max(cl, axis=-1).reshape(bb, h * w))
            cls_l.append(jnp.argmax(cl, axis=-1).reshape(bb, h * w).astype(jnp.float32))
            bd_l.append(f[..., : 4 * reg_max].reshape(bb, h * w, 4 * reg_max))
        best_logit = jnp.concatenate(best_l, axis=1)  # (B, A) bf16
        cls = jnp.concatenate(cls_l, axis=1)
        bd = jnp.concatenate(bd_l, axis=1)  # (B, A, 64) bf16
        ap, strd = make_anchors([(imgsz // s, imgsz // s) for s in strides], strides)
        top_logit, top_idx = lax.approx_max_k(best_logit.astype(jnp.float32), k, recall_target=1.0)
        cbd = jnp.take_along_axis(bd, top_idx[..., None], axis=1)
        dist = dfl_expectation(cbd, reg_max, dtype=cbd.dtype)
        cap = ap[top_idx]
        cst = strd[top_idx]
        cboxes2 = dist2bbox(dist, cap) * cst
        best = jax.nn.sigmoid(top_logit)
        ccls = jnp.take_along_axis(cls, top_idx, axis=1)
        conf = jnp.float32(0.25)
        valid2 = best > conf
        from yolo_infer_tpu.ops.nms import MAX_WH

        sup = cboxes2 + ccls[..., None] * MAX_WH

        def one(bxi, vai):
            iou = box_iou_matrix(bxi, bxi)
            return _nms_fixpoint(iou, vai, jnp.float32(0.45), max_sweeps=k)

        kept = jax.vmap(one)(sup, valid2)
        final = jnp.where(kept, best, -1.0)
        out_scores, sel = lax.top_k(final, 300)
        return out_scores, jnp.take_along_axis(cboxes2, sel[..., None], axis=1)

    res["tail_candfirst_ms"] = bench(tail_candfirst, (feats,))

    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    sys.exit(main())
