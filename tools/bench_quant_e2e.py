#!/usr/bin/env python
"""End-to-end int8 (static8 residency) vs bf16 benchmark on the real TPU.

The reference's quantization headline is the FP32-vs-int8 speedup ratio
(reference benchmarks/speed_benchmark.py:124-209); this measures the TPU
analog: bf16 serving path vs the PTQ int8-residency path, yolo11{n,m} @640,
batches {1, 32, 128}. Prints one JSON line per config.
"""

import json
import os
import sys

import numpy as np


def main():
    import jax.numpy as jnp

    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.optimization.quantization.quantizers import PostTrainingQuantizer

    sizes = os.environ.get("SIZES", "n").split(",")
    batches = [int(b) for b in os.environ.get("BATCHES", "32,128").split(",")]
    imgsz = int(os.environ.get("IMGSZ", "640"))
    runs = int(os.environ.get("RUNS", "50"))

    rng = np.random.default_rng(0)
    for size in sizes:
        model = YOLO11Model(f"yolo11{size}")
        q = PostTrainingQuantizer(model, {"imgsz": imgsz})
        q.set_calibration_data([rng.integers(0, 255, (2, imgsz, imgsz, 3), dtype=np.uint8) for _ in range(2)])
        qmodel = q.optimize()
        if os.environ.get("MIN_CHANNELS", ""):
            # eligibility-threshold sweep (r5: is C=96 int8-profitable at
            # x/b128? the boundary sweep only measured 64 and 128)
            qmodel.quant_min_channels = int(os.environ["MIN_CHANNELS"])
            qmodel.invalidate()
        weight_only = os.environ.get("WEIGHT_ONLY", "0") == "1"
        for batch in batches:
            bf = model.benchmark(imgsz=imgsz, batch=batch, runs=runs, warmup=5)
            i8 = qmodel.benchmark(imgsz=imgsz, batch=batch, runs=runs, warmup=5)
            row = {
                "size": size, "batch": batch, "imgsz": imgsz,
                "bf16_fps": round(bf["throughput_imgs_per_s"], 1),
                "int8_fps": round(i8["throughput_imgs_per_s"], 1),
                "speedup": round(i8["throughput_imgs_per_s"] / bf["throughput_imgs_per_s"], 3),
                "bf16_ms": round(bf["avg_time_s"] * 1e3, 2),
                "int8_ms": round(i8["avg_time_s"] * 1e3, 2),
            }
            if weight_only:
                # weight-only int8: every conv exempted from int8 residency,
                # weights stay int8 in HBM and dequantize to bf16 at use —
                # halves the weight traffic that dominates batch-1 latency
                # (reference quantization protocol measures b1,
                # reference benchmarks/speed_benchmark.py:160-163)
                qmodel.quant_min_channels = 1 << 30
                qmodel.invalidate()
                wo = qmodel.benchmark(imgsz=imgsz, batch=batch, runs=runs, warmup=5)
                qmodel.quant_min_channels = None
                qmodel.invalidate()
                row["wonly_fps"] = round(wo["throughput_imgs_per_s"], 1)
                row["wonly_ms"] = round(wo["avg_time_s"] * 1e3, 2)
                row["wonly_speedup"] = round(wo["throughput_imgs_per_s"] / bf["throughput_imgs_per_s"], 3)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    sys.exit(main())
