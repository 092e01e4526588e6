"""Stacked levers on real TPU: physical surgery (keep 0.5) + static8 PTQ.

For m and x at b128 (the throughput regimes): slim the deploy tree,
calibrate static8 on the slimmed model, bench the quantized-slim model.
Dense and slim-bf16 controls come from tools/bench_surgery.py (same
protocol). One JSON row per phase, incremental.

Run detached: setsid nohup python tools/bench_slim_int8.py > /tmp/bench_slim_int8.log 2>&1 &
"""

import json
import sys
import time

from yolo_infer_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def row(**kw):
    print(json.dumps(kw), flush=True)


TRANSIENT = ("INVALID_ARGUMENT", "InvalidArgument", "UNAVAILABLE", "DEADLINE", "INTERNAL", "RESOURCE_EXHAUSTED")


def _retry(fn, attempts=2):
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            if i + 1 < attempts and any(t in f"{type(e).__name__}: {e}" for t in TRANSIENT):
                continue
            raise


def main():
    import jax
    import numpy as np

    for attempt in range(4):
        try:
            jax.devices()
            break
        except RuntimeError as e:
            if "UNAVAILABLE" not in str(e) or attempt == 3:
                raise
            row(event="init_unavailable", attempt=attempt)
            time.sleep(600)

    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.optimization.quantization.quantizers import PostTrainingQuantizer
    from yolo_infer_tpu.optimization.surgery import slim_model

    row(backend=jax.default_backend(), event="start")
    configs = sys.argv[1:] or ["m:128", "x:128"]
    rng = np.random.default_rng(0)
    for cfg in configs:
        size, b = cfg.split(":")
        b = int(b)
        model = YOLO11Model(f"yolo11{size}")
        sp, _, _, rep = slim_model(model.deploy_params, None, model.spec, keep_frac=0.5)
        slim = YOLO11Model.from_params(sp, task="detect", size=size, nc=80, fused=True,
                                       model_path=f"yolo11{size}-slim")
        q = PostTrainingQuantizer(slim, {"imgsz": 640})
        q.set_calibration_data([rng.integers(0, 255, (2, 640, 640, 3), dtype=np.uint8)])
        qslim = _retry(q.optimize)
        row(size=size, event="quantized_slim", params_ratio=round(rep["params_ratio"], 4),
            observed_convs=q.optimization_info["num_observed_convs"])
        r = _retry(lambda: qslim.benchmark(640, b, runs=15, warmup=3))
        row(size=size, batch=b, kind="slim_int8", fps=round(r["throughput_imgs_per_s"], 1),
            avg_ms=round(r["avg_time_s"] * 1e3, 3), std_ms=round(r["std_time_s"] * 1e3, 3),
            windows_ms=r["window_avgs_ms"], compile_s=round(r["compile_time_s"], 1))
    row(event="done")


if __name__ == "__main__":
    main()
