#!/usr/bin/env python
"""Attribute the n/b32 small-batch serving gap (VERDICT r3 -> r4 item 1).

b32 runs 13.7 ms/batch (0.429 ms/img) vs b128's 21.3 ms (0.166 ms/img) —
2.6x worse per image, while b1 finishes in 1.67 ms (so it is NOT a fixed
~11 ms cost; something scales badly specifically in the middle). This
script decomposes the e2e program at b32 AND b128 in one process:

  stage level : preprocess | preprocess+forward (DCE-safe) | full (+tail)
  tail pieces : decode_for_nms | approx top-k | fused Pallas keep kernel |
                final top_k(300) + gathers

Every row prints immediately (a wedge mid-run keeps the earlier rows).

PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_b32.py
env: SIZE=n BATCHES=32,128 IMGSZ=640 RUNS=40 K=512
"""

import json
import os
import sys
import time

import numpy as np


def sync_leaf(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def bench_fn(fn, args, runs=40):
    out = fn(*args)
    sync_leaf(out)
    for _ in range(3):
        out = fn(*args)
    sync_leaf(out)
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(runs):
            out = fn(*args)
        sync_leaf(out)
        reps.append((time.perf_counter() - t0) / runs)
    return float(np.median(reps)) * 1e3  # ms


def main():
    from yolo_infer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.models.yolo11 import forward
    from yolo_infer_tpu.ops.decode import decode_for_nms
    from yolo_infer_tpu.ops.nms import MAX_WH, _exact_topk, batched_nms_presel, nms_keep_mask
    from yolo_infer_tpu.ops.preprocess import preprocess_batch

    size = os.environ.get("SIZE", "n")
    batches = [int(b) for b in os.environ.get("BATCHES", "32,128").split(",")]
    imgsz = int(os.environ.get("IMGSZ", "640"))
    runs = int(os.environ.get("RUNS", "40"))
    k = int(os.environ.get("K", "512"))
    nc, reg_max, strides = 80, 16, (8, 16, 32)
    rng = np.random.default_rng(0)

    model = YOLO11Model(f"yolo11{size}")
    spec = model.spec
    params = model.deploy_params
    print(json.dumps({"device": str(jax.devices()[0]), "size": size, "imgsz": imgsz}), flush=True)

    for b in batches:
        images = jnp.asarray(rng.integers(0, 255, (b, imgsz, imgsz, 3), dtype=np.uint8))

        @jax.jit
        def f_pre(imgs):
            return preprocess_batch(imgs, out_hw=(imgsz, imgsz), dtype=jnp.bfloat16)

        @jax.jit
        def f_fwd(p, imgs):
            x = preprocess_batch(imgs, out_hw=(imgsz, imgsz), dtype=jnp.bfloat16)
            out, _ = forward(p, None, spec, x, compute_dtype=jnp.bfloat16)
            return [jnp.sum(f.astype(jnp.float32)) for f in out["feats"]]  # all levels live

        @jax.jit
        def f_fwd_only(p, x):
            out, _ = forward(p, None, spec, x, compute_dtype=jnp.bfloat16)
            return [jnp.sum(f.astype(jnp.float32)) for f in out["feats"]]

        @jax.jit
        def f_full(p, imgs):
            x = preprocess_batch(imgs, out_hw=(imgsz, imgsz), dtype=jnp.bfloat16)
            out, _ = forward(p, None, spec, x, compute_dtype=jnp.bfloat16)
            boxes, best, cls = decode_for_nms(out["feats"], spec.nc, spec.reg_max, spec.strides)
            return batched_nms_presel(boxes, best, cls, 0.25, 0.45, pre_topk=k, max_det=300)

        row = {"size": size, "batch": b}
        row["pre_ms"] = round(bench_fn(f_pre, (images,), runs), 3)
        row["pre_fwd_ms"] = round(bench_fn(f_fwd, (params, images), runs), 3)
        x_pre = jnp.asarray(rng.standard_normal((b, imgsz, imgsz, 3)).astype(np.float32), jnp.bfloat16)
        row["fwd_only_ms"] = round(bench_fn(f_fwd_only, (params, x_pre), runs), 3)
        row["full_ms"] = round(bench_fn(f_full, (params, images), runs), 3)
        row["tail_ms"] = round(row["full_ms"] - row["pre_fwd_ms"], 3)
        print(json.dumps(row), flush=True)

        # ---- tail pieces on synthetic feats (match head output shapes)
        feats = [
            jnp.asarray(rng.standard_normal((b, imgsz // s, imgsz // s, 4 * reg_max + nc)) * 2 - 6,
                        jnp.bfloat16)
            for s in strides
        ]
        a_total = sum((imgsz // s) ** 2 for s in strides)
        trow = {"size": size, "batch": b, "kind": "tail_pieces", "A": a_total, "K": k}

        trow["decode_for_nms_ms"] = round(bench_fn(
            jax.jit(lambda fs: decode_for_nms(fs, nc, reg_max, strides)), (feats,), runs), 3)

        best_f32 = jnp.asarray(rng.standard_normal((b, a_total)).astype(np.float32))
        trow["approx_topk_ms"] = round(bench_fn(
            jax.jit(lambda s: lax.approx_max_k(s, k, recall_target=1.0)), (best_f32,), runs), 3)

        cb = rng.uniform(0, imgsz, (b, k, 4)).astype(np.float32)
        cboxes = jnp.asarray(np.concatenate(
            [np.minimum(cb[..., :2], cb[..., 2:]), np.maximum(cb[..., :2], cb[..., 2:]) + 4], axis=-1))
        valid = jnp.asarray(rng.uniform(size=(b, k)) < 0.3)
        trow["keep_kernel_ms"] = round(bench_fn(
            jax.jit(lambda bx, va: nms_keep_mask(bx, va, jnp.float32(0.45), k)), (cboxes, valid), runs), 3)

        final = jnp.asarray(rng.standard_normal((b, k)).astype(np.float32))
        trow["final_topk300_ms"] = round(bench_fn(
            jax.jit(lambda f: lax.top_k(f, 300)), (final,), runs), 3)

        nms_in_boxes = jnp.asarray(rng.uniform(0, imgsz, (b, a_total, 4)).astype(np.float32))
        nms_best = jnp.asarray(rng.uniform(0, 1, (b, a_total)).astype(np.float32))
        nms_cls = jnp.asarray(rng.integers(0, nc, (b, a_total)).astype(np.float32))
        trow["nms_presel_ms"] = round(bench_fn(
            jax.jit(lambda bx, bs, cl: batched_nms_presel(bx, bs, cl, 0.25, 0.45, pre_topk=k, max_det=300)),
            (nms_in_boxes, nms_best, nms_cls), runs), 3)
        print(json.dumps(trow), flush=True)


if __name__ == "__main__":
    sys.exit(main())
