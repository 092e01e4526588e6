#!/usr/bin/env python
"""Round 2 of tail/preprocess attacks at yolo11n b128 on the real TPU.

1. In-program preprocess cost: forward from uint8 (device letterbox) vs
   forward from pre-letterboxed bf16 — the marginal cost inside the fused
   program, not the standalone-jit number.
2. DFL via MXU: exp(x - rowmax) then one (64, 8) matmul (bins*onehot |
   onehot) and a 4-lane divide — avoids the (B, A, 4, 16) reshape whose
   16-value lane tiles waste 7/8 of the VPU.
3. Full production program with the MXU DFL swapped in.

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_tail2.py

MEASURED (v5e-1, yolo11n b128):
  fwd_from_u8 16.38 ms vs fwd_from_bf16 15.67 ms — the in-program marginal
    cost of device letterbox+normalize is 0.7 ms; the 2.4-3.6 ms standalone
    number is a jit-output materialization artifact. Preprocess is NOT a
    bottleneck; no Pallas kernel warranted.
  dfl_mxu 2.26 ms vs dfl_xla 3.51 ms STANDALONE — but full_mxu 23.03 ms vs
    full_now 22.70 ms IN-PROGRAM: XLA already fuses the per-level DFL into
    the head epilogue, and the MXU variant's f32 exp intermediate blocks
    that fusion. Negative result; production keeps ops.decode.dfl_expectation.
"""

import json
import os
import sys
import time

import numpy as np


def sync(x):
    import jax

    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def bench(fn, args, runs=30):
    out = fn(*args)
    sync(out)
    for _ in range(3):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / runs * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.models.yolo11 import forward
    from yolo_infer_tpu.ops.decode import dfl_expectation, dist2bbox, make_anchors
    from yolo_infer_tpu.ops.nms import batched_nms_presel
    from yolo_infer_tpu.ops.preprocess import preprocess_batch

    b = int(os.environ.get("B", "128"))
    imgsz = 640
    reg_max = 16
    rng = np.random.default_rng(0)
    res = {}

    def record(name, fn):
        try:
            res[name] = fn()
        except Exception as e:  # noqa: BLE001
            res[name + "_err"] = str(e).replace("\n", " ")[:200]
        print(json.dumps({name: res.get(name, res.get(name + "_err"))}), flush=True)

    model = YOLO11Model("yolo11n")
    spec = model.spec
    params = model.deploy_params
    images = jnp.asarray(rng.integers(0, 255, (b, imgsz, imgsz, 3), dtype=np.uint8))
    xbf = jax.jit(lambda im: preprocess_batch(im, out_hw=(imgsz, imgsz), dtype=jnp.bfloat16))(images)
    xbf = jax.block_until_ready(xbf)

    @jax.jit
    def fwd_u8(p, im):
        x = preprocess_batch(im, out_hw=(imgsz, imgsz), dtype=jnp.bfloat16)
        out, _ = forward(p, None, spec, x, compute_dtype=jnp.bfloat16)
        return out["feats"][0]

    @jax.jit
    def fwd_bf16(p, x):
        out, _ = forward(p, None, spec, x, compute_dtype=jnp.bfloat16)
        return out["feats"][0]

    record("fwd_from_u8_ms", lambda: bench(fwd_u8, (params, images)))
    record("fwd_from_bf16_ms", lambda: bench(fwd_bf16, (params, xbf)))

    # --- MXU DFL ---
    a_total = sum((imgsz // s) ** 2 for s in spec.strides)
    bd = jnp.asarray(rng.standard_normal((b, a_total, 64)), jnp.bfloat16)

    W = np.zeros((64, 8), np.float32)
    for g in range(4):
        W[g * 16 : (g + 1) * 16, g] = np.arange(16)
        W[g * 16 : (g + 1) * 16, 4 + g] = 1.0
    Wc = jnp.asarray(W, jnp.bfloat16)

    def dfl_mxu(x):
        xf = x.astype(jnp.float32)
        m = jnp.max(xf, axis=-1, keepdims=True)
        e = jnp.exp(xf - m).astype(jnp.bfloat16)
        y = jnp.einsum("bak,ko->bao", e, Wc, preferred_element_type=jnp.float32)
        return y[..., :4] / y[..., 4:]

    f_x = jax.jit(lambda x: dfl_expectation(x, reg_max, dtype=x.dtype))
    f_m = jax.jit(dfl_mxu)
    record("dfl_xla_ms", lambda: bench(f_x, (bd,)))
    record("dfl_mxu_ms", lambda: bench(f_m, (bd,)))
    record("dfl_mxu_maxdiff", lambda: float(jnp.max(jnp.abs(f_x(bd).astype(jnp.float32) - f_m(bd)))))

    # --- full program with MXU DFL in the per-level decode ---
    def decode_for_nms_mxu(feats, nc, strides):
        boxes_l, best_l, cls_l = [], [], []
        for f, stride in zip(feats, strides):
            bb, h, w, _ = f.shape
            box_dist = f[..., : 4 * reg_max].reshape(bb, h * w, 4 * reg_max)
            cls_logits = f[..., 4 * reg_max :]
            dist = dfl_mxu(box_dist)
            ap, _ = make_anchors([(h, w)], [stride])
            boxes_l.append(dist2bbox(dist, ap[None]) * float(stride))
            best_l.append(jnp.max(cls_logits, axis=-1).reshape(bb, h * w))
            cls_l.append(jnp.argmax(cls_logits, axis=-1).reshape(bb, h * w))
        boxes = jnp.concatenate(boxes_l, axis=1)
        best = jax.nn.sigmoid(jnp.concatenate(best_l, axis=1).astype(jnp.float32))
        cls = jnp.concatenate(cls_l, axis=1).astype(jnp.float32)
        return boxes, best, cls

    from yolo_infer_tpu.ops.decode import decode_for_nms

    @jax.jit
    def full_now(p, im):
        x = preprocess_batch(im, out_hw=(imgsz, imgsz), dtype=jnp.bfloat16)
        out, _ = forward(p, None, spec, x, compute_dtype=jnp.bfloat16)
        boxes, best, cls = decode_for_nms(out["feats"], spec.nc, spec.reg_max, spec.strides)
        return batched_nms_presel(boxes, best, cls, 0.25, 0.45, pre_topk=512, max_det=300)

    @jax.jit
    def full_mxu(p, im):
        x = preprocess_batch(im, out_hw=(imgsz, imgsz), dtype=jnp.bfloat16)
        out, _ = forward(p, None, spec, x, compute_dtype=jnp.bfloat16)
        boxes, best, cls = decode_for_nms_mxu(out["feats"], spec.nc, spec.strides)
        return batched_nms_presel(boxes, best, cls, 0.25, 0.45, pre_topk=512, max_det=300)

    record("full_now_ms", lambda: bench(full_now, (params, images)))
    record("full_mxu_ms", lambda: bench(full_mxu, (params, images)))
    print(json.dumps(res))


if __name__ == "__main__":
    sys.exit(main())
