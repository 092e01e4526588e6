"""Measure the physical-surgery speedup on real TPU hardware.

Dense vs slimmed (keep_frac 0.5, align 8) yolo11{n,m} end-to-end serving
throughput (incl. NMS) via the FIFO-safe `model.benchmark` protocol.
Prints one JSON row per phase incrementally (a killed run keeps its rows).

Run detached:  setsid nohup python tools/bench_surgery.py > /tmp/bench_surgery.log 2>&1 &
"""

import json
import sys
import time

from yolo_infer_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from yolo_infer_tpu.core.model import YOLO11Model  # noqa: E402
from yolo_infer_tpu.models.yolo11 import param_count  # noqa: E402
from yolo_infer_tpu.optimization.surgery import slim_model  # noqa: E402


def row(**kw):
    print(json.dumps(kw), flush=True)


TRANSIENT = ("INVALID_ARGUMENT", "InvalidArgument", "UNAVAILABLE", "DEADLINE", "INTERNAL", "RESOURCE_EXHAUSTED")


def _retry(fn, attempts=2):
    """The axon tunnel emits spurious InvalidArgument on very large compiles
    (PERF_MATRIX notes) — retry once rather than lose the remaining rows."""
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            if i + 1 < attempts and any(t in f"{type(e).__name__}: {e}" for t in TRANSIENT):
                continue
            raise


def main():
    import jax

    # wedge recovery: a killed client can hold the TPU claim for 20+ min,
    # during which backend init hangs then dies UNAVAILABLE — retry quietly
    for attempt in range(4):
        try:
            jax.devices()
            break
        except RuntimeError as e:
            if "UNAVAILABLE" not in str(e) or attempt == 3:
                raise
            row(event="init_unavailable", attempt=attempt, sleeping_s=600)
            time.sleep(600)

    row(backend=jax.default_backend(), event="start", t=time.time())
    configs = [("n", [32]), ("m", [32, 128])]
    if len(sys.argv) > 1:
        configs = [(s, [int(b) for b in bs.split(",")]) for s, bs in
                   (c.split(":") for c in sys.argv[1:])]
    import os

    keeps = [float(k) for k in os.environ.get("BENCH_KEEPS", "0.5").split(",")]
    bench_dense = os.environ.get("BENCH_DENSE", "1") == "1"
    for size, batches in configs:
        model = YOLO11Model(f"yolo11{size}")
        n_dense = param_count(model.deploy_params)
        slims = []
        for keep in keeps:
            slim_p, _, _, rep = slim_model(model.deploy_params, None, model.spec, keep_frac=keep)
            slims.append((keep, YOLO11Model.from_params(
                slim_p, task="detect", size=size, nc=80, fused=True,
                model_path=f"yolo11{size}-slim{keep}")))
            row(size=size, event="slimmed", keep=keep, params_dense=n_dense,
                params_slim=rep["params_after"], params_ratio=round(rep["params_ratio"], 4))
        for b in batches:
            runs = [("dense", model)] if bench_dense else []
            runs += [(f"slim{keep}", m) for keep, m in slims]
            for kind, m in runs:
                r = _retry(lambda m=m, b=b: m.benchmark(640, b, runs=50, warmup=5))
                row(size=size, batch=b, kind=kind,
                    fps=round(r["fps"], 1),
                    avg_ms=round(r["avg_time_s"] * 1e3, 3),
                    std_ms=round(r["std_time_s"] * 1e3, 3),
                    windows_ms=r["window_avgs_ms"],
                    latency_ms=round(r["latency_s"] * 1e3, 2),
                    compile_s=round(r["compile_time_s"], 1))
    row(event="done", t=time.time())


if __name__ == "__main__":
    main()
