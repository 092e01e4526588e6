#!/usr/bin/env python
"""Perf matrix: yolo11{n,m} @640, batch {1, 32, 128} — e2e + stage decomposition.

Per config records:
  sustained_fps  — runs queued back-to-back, one sync (device throughput)
  percall_ms     — each call synced (includes one host<->device round trip)
  rtt_ms         — percall - sustained (the tunnel/host component of b1 latency)
Stage decomposition (forward-only vs +decode+NMS vs full preprocess) shows
where the time goes (BASELINE.md protocol; VERDICT #2).

PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_matrix.py | tee PERF_MATRIX.json
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


def bench_fn(fn, args, runs):
    out = fn(*args)
    sync_leaf(out)
    for _ in range(3):
        out = fn(*args)
    sync_leaf(out)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
    sync_leaf(out)
    sustained = (time.perf_counter() - t0) / runs
    t0 = time.perf_counter()
    for _ in range(max(runs // 4, 5)):
        out = fn(*args)
        sync_leaf(out)
    percall = (time.perf_counter() - t0) / max(runs // 4, 5)
    return sustained, percall


def main():
    import jax
    import jax.numpy as jnp

    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.models.yolo11 import forward
    from yolo_infer_tpu.ops.decode import decode_for_nms
    from yolo_infer_tpu.ops.nms import batched_nms_presel
    from yolo_infer_tpu.ops.preprocess import preprocess_batch

    sizes = os.environ.get("SIZES", "n,m").split(",")
    batches = [int(b) for b in os.environ.get("BATCHES", "1,32,128").split(",")]
    imgsz = int(os.environ.get("IMGSZ", "640"))
    runs = int(os.environ.get("RUNS", "50"))
    rng = np.random.default_rng(0)

    results = {"hardware": str(jax.devices()[0]), "imgsz": imgsz, "configs": []}
    for size in sizes:
        model = YOLO11Model(f"yolo11{size}")
        spec = model.spec
        params = model.deploy_params

        for batch in batches:
            r = model.benchmark(imgsz=imgsz, batch=batch, runs=runs, warmup=5)
            sustained_ms = r["avg_time_s"] * 1e3
            percall_ms = r["latency_s"] * 1e3
            row = {
                "size": size, "batch": batch,
                "sustained_fps": round(r["throughput_imgs_per_s"], 1),
                "sustained_ms": round(sustained_ms, 3),
                "percall_ms": round(percall_ms, 3),
                "rtt_ms": round(percall_ms - sustained_ms, 3),
                "compile_s": round(r["compile_time_s"], 1),
            }
            results["configs"].append(row)
            print(json.dumps(row), flush=True)

        # stage decomposition at the headline batches
        for batch in (1, 128):
            if batch not in batches:
                continue
            images = jnp.asarray(rng.integers(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8))

            @jax.jit
            def f_pre(imgs):
                return preprocess_batch(imgs, out_hw=(imgsz, imgsz), dtype=jnp.bfloat16)

            @jax.jit
            def f_fwd(p, imgs):
                x = preprocess_batch(imgs, out_hw=(imgsz, imgsz), dtype=jnp.bfloat16)
                out, _ = forward(p, None, spec, x, compute_dtype=jnp.bfloat16)
                # return EVERY feat level: returning only feats[0] lets XLA
                # dead-code-eliminate the P4/P5 head branches, inflating the
                # apparent decode tail by the eliminated head compute
                # (~8 ms at m/b128 — tools /tmp/m_tail_probe round 2)
                return [jnp.sum(f.astype(jnp.float32)) for f in out["feats"]]

            @jax.jit
            def f_full(p, imgs):
                x = preprocess_batch(imgs, out_hw=(imgsz, imgsz), dtype=jnp.bfloat16)
                out, _ = forward(p, None, spec, x, compute_dtype=jnp.bfloat16)
                boxes, best, cls = decode_for_nms(out["feats"], spec.nc, spec.reg_max, spec.strides)
                return batched_nms_presel(boxes, best, cls, 0.25, 0.45, pre_topk=512, max_det=300)

            pre_s, _ = bench_fn(f_pre, (images,), runs)
            fwd_s, _ = bench_fn(f_fwd, (params, images), runs)
            full_s, _ = bench_fn(f_full, (params, images), runs)
            row = {
                "size": size, "batch": batch, "stage_decomposition_ms": {
                    "preprocess": round(pre_s * 1e3, 3),
                    "preprocess+forward": round(fwd_s * 1e3, 3),
                    "full(+decode+nms)": round(full_s * 1e3, 3),
                    "decode_nms_tail": round((full_s - fwd_s) * 1e3, 3),
                },
            }
            results["configs"].append(row)
            print(json.dumps(row), flush=True)

    out_path = os.environ.get("OUT", "PERF_MATRIX.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    sys.exit(main())
