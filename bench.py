#!/usr/bin/env python
"""Headline benchmark: yolo11n end-to-end frames/sec/chip @ 640x640.

Measures the full pipeline on device — uint8 letterbox/normalize, bf16
forward, DFL decode, batched NMS — with `jax.block_until_ready`
synchronization, warmup=10 / runs=100 (the reference's protocol,
reference benchmarks/speed_benchmark.py:34-39, but with real device sync;
its wall-clock timers never synchronized — SURVEY.md §6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import glob
import json
import os
import re
import sys


def main() -> None:
    import jax
    import jax.numpy as jnp

    from yolo_infer_tpu.core.model import YOLO11Model

    size = os.environ.get("BENCH_SIZE", "n")
    imgsz = int(os.environ.get("BENCH_IMGSZ", "640"))
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    runs = int(os.environ.get("BENCH_RUNS", "100"))

    model = YOLO11Model(f"yolo11{size}")
    profile_dir = os.environ.get("BENCH_PROFILE")  # set to a dir to capture a jax.profiler trace
    result = model.benchmark(imgsz=imgsz, batch=batch, runs=runs, warmup=10, profile_dir=profile_dir)
    fps = result["throughput_imgs_per_s"]

    # secondary reading at the throughput-optimal batch (b128 ~2x b32 on v5e)
    big_batch = int(os.environ.get("BENCH_BIG_BATCH", "128"))
    big_fps = None
    if big_batch > batch:
        try:
            big = model.benchmark(imgsz=imgsz, batch=big_batch, runs=max(runs // 4, 10), warmup=3)
            big_fps = round(big["throughput_imgs_per_s"], 2)
        except Exception:
            pass

    # vs_baseline: ratio to the most recent recorded round, else 1.0
    prev = None
    for path in sorted(glob.glob("BENCH_r*.json"), key=lambda p: int(re.search(r"r(\d+)", p).group(1))):
        try:
            data = json.loads(open(path).read())
            if isinstance(data, dict) and "value" in data:
                prev = float(data["value"])
        except Exception:
            pass
    vs = fps / prev if prev else 1.0

    extras = {
        "avg_ms": result["avg_time_s"] * 1e3,
        "std_ms": result["std_time_s"] * 1e3,
        "compile_s": result["compile_time_s"],
        "backend": jax.default_backend(),
        "batch": batch,
        "imgsz": imgsz,
        "fps_at_batch_%d" % big_batch: big_fps,
    }
    print(json.dumps({
        "metric": f"yolo11{size}_{imgsz}_b{batch}_e2e_fps_per_chip",
        "value": round(fps, 2),
        "unit": "imgs/s",
        "vs_baseline": round(vs, 4),
        **extras,
    }))


if __name__ == "__main__":
    sys.exit(main())
