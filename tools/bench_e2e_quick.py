#!/usr/bin/env python
"""Quick e2e throughput check of the production predict path on the TPU.

Also re-measures the (fixed) Pallas DFL kernel vs the XLA formulation.
PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_e2e_quick.py
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

    res = {}

    def record(name, fn):
        try:
            res[name] = fn()
        except Exception as e:  # noqa: BLE001
            res[name + "_err"] = str(e).replace("\n", " ")[:200]
        print(json.dumps({name: res.get(name, res.get(name + "_err"))}), flush=True)

    if os.environ.get("DFL", "1") == "1":
        from yolo_infer_tpu.ops.decode import dfl_expectation
        from yolo_infer_tpu.ops.pallas.dfl_kernel import dfl_decode_pallas

        rng = np.random.default_rng(0)
        bd = jnp.asarray(rng.standard_normal((128, 8400, 64)), jnp.bfloat16)
        f_x = jax.jit(lambda x: dfl_expectation(x, 16, dtype=x.dtype))
        f_p = jax.jit(lambda x: dfl_decode_pallas(x, 16))
        record("dfl_xla_ms", lambda: bench(f_x, (bd,)))
        record("dfl_pallas_ms", lambda: bench(f_p, (bd,)))
        record("dfl_maxdiff", lambda: float(jnp.max(jnp.abs(f_x(bd).astype(jnp.float32) - f_p(bd)))))

    from yolo_infer_tpu.core.model import YOLO11Model

    model = YOLO11Model("yolo11" + os.environ.get("SIZE", "n"))
    for batch in (int(b) for b in os.environ.get("BATCHES", "128,32,1").split(",")):
        runs = 60 if batch <= 32 else 20
        record(
            f"e2e_b{batch}",
            lambda b=batch, r=runs: {
                "fps": round(model.benchmark(imgsz=640, batch=b, runs=r, warmup=5)["throughput_imgs_per_s"], 1)
            },
        )
    print(json.dumps(res))


if __name__ == "__main__":
    sys.exit(main())
