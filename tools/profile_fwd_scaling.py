#!/usr/bin/env python
"""Forward-pass batch-scaling curve: where does the ~11 ms floor appear?

profile_b32.py found the n/640 forward costs ~11.5 ms at b32 and ~12.4 ms at
b128 — nearly batch-independent — while the b1 e2e program runs in 1.6 ms.
This sweeps the BARE forward (no preprocess/tail) across batch sizes to find
the shape of the curve: a step at b=2 means b1 compiles to a structurally
different program; a smooth ramp means per-image cost with a large fixed
component spread across kernels.

PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_fwd_scaling.py
env: SIZE=n BATCHES=1,2,4,8,16,32,64,128 IMGSZ=640 RUNS=40
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

    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.models.yolo11 import forward

    size = os.environ.get("SIZE", "n")
    batches = [int(b) for b in os.environ.get("BATCHES", "1,2,4,8,16,32,64,128").split(",")]
    imgsz = int(os.environ.get("IMGSZ", "640"))
    runs = int(os.environ.get("RUNS", "40"))
    rng = np.random.default_rng(0)

    model = YOLO11Model(f"yolo11{size}")
    spec = model.spec
    params = model.deploy_params
    print(json.dumps({"device": str(jax.devices()[0]), "size": size, "imgsz": imgsz}), flush=True)

    @jax.jit
    def f_fwd(p, x):
        out, _ = forward(p, None, spec, x, compute_dtype=jnp.bfloat16)
        return [jnp.sum(f.astype(jnp.float32)) for f in out["feats"]]

    for b in batches:
        x = jnp.asarray(rng.standard_normal((b, imgsz, imgsz, 3)).astype(np.float32), jnp.bfloat16)
        t0 = time.perf_counter()
        sync_leaf(f_fwd(params, x))
        compile_s = time.perf_counter() - t0
        r = runs if b <= 32 else max(runs // 4, 10)
        ms = bench_fn(f_fwd, (params, x), r)
        print(json.dumps({"size": size, "batch": b, "fwd_ms": round(ms, 3),
                          "ms_per_img": round(ms / b, 4),
                          "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
