#!/usr/bin/env python
"""Training-step throughput on the real TPU (yolo11{n,m} @640, b16/b32).

Measures the jitted step — bf16 forward, TAL assign, CIoU/DFL/BCE losses,
f32 grads, global-norm clip, finite guard, optax update, EMA — on synthetic
batches, with real device sync. Complements the inference PERF_MATRIX
(training throughput was previously unmeasured on hardware).

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_train_step.py
"""

import json
import os
import sys
import time

import numpy as np


def sync(x):
    import jax

    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def main():
    import jax
    import jax.numpy as jnp

    from yolo_infer_tpu.core.train_step import init_train_state, make_train_step
    from yolo_infer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    imgsz = int(os.environ.get("IMGSZ", "640"))
    qat = os.environ.get("QAT", "0") == "1"  # fake-quant (STE) in the step
    rng = np.random.default_rng(0)
    res = []
    for size in os.environ.get("SIZES", "n,m").split(","):
        for b in (int(x) for x in os.environ.get("BATCHES", "16,32").split(",")):
            # the PRODUCTION step: yolo_sgd warmup optimizer, finite guard, EMA
            ts = init_train_state(jax.random.PRNGKey(0), "detect", size, nc=80, imgsz=imgsz)
            spec = ts.spec
            step = make_train_step(spec, ts.tx, qat=qat)
            m = 32  # max GT boxes
            batch = {
                "images": jnp.asarray(rng.random((b, imgsz, imgsz, 3), np.float32)),
                "boxes": jnp.asarray(rng.uniform(0, imgsz, (b, m, 4)).astype(np.float32)),
                "classes": jnp.asarray(rng.integers(0, 80, (b, m)).astype(np.float32)),
                "mask": jnp.asarray(np.ones((b, m), np.float32)),
            }
            t0 = time.perf_counter()
            ts, metrics = step(ts, batch)
            sync(metrics)
            compile_s = time.perf_counter() - t0
            for _ in range(3):
                ts, metrics = step(ts, batch)
            sync(metrics)
            runs = 15
            t0 = time.perf_counter()
            for _ in range(runs):
                ts, metrics = step(ts, batch)
            sync(metrics)
            ms = (time.perf_counter() - t0) / runs * 1e3
            row = {"size": size, "batch": b, "train_step_ms": round(ms, 2),
                   "train_imgs_per_s": round(b / ms * 1e3, 1), "compile_s": round(compile_s, 1),
                   "loss_finite": bool(np.isfinite(float(metrics["loss"])))}
            if qat:
                row["kind"] = "qat_train_step"
            res.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"imgsz": imgsz, "rows": res}))


if __name__ == "__main__":
    sys.exit(main())
