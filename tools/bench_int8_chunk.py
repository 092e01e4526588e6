#!/usr/bin/env python
"""Does batch-chunked serving help the int8 (static8) path?

The round-4 chunk policy (core/predictor.py _serve_chunk) gates chunking OFF
for quantized predictors — a conservative default that was never measured.
If the lane-starved b32 layout pathology (batch-in-lanes early convs +
multi-MB relayout copies) also afflicts the int8 program, chunk-16 subgraphs
would un-starve it the same way they did bf16 (14.1 -> 9.7 ms at n/b32).
This A/Bs the quantized model whole vs forced chunk-16 (env override, which
_serve_chunk honors ahead of the quantized gate).

Reference protocol parity: quantized-vs-base speed comparison (reference
benchmarks/speed_benchmark.py:124-209), with real device sync.

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_int8_chunk.py
env: SIZE=n BATCH=32 IMGSZ=640 RUNS=30 VARIANTS=whole,chunk16_unroll,chunk16_scan
"""

import json
import os
import sys

import numpy as np


def main():
    from yolo_infer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.optimization.quantization.quantizers import PostTrainingQuantizer

    size = os.environ.get("SIZE", "n")
    imgsz = int(os.environ.get("IMGSZ", "640"))
    batch = int(os.environ.get("BATCH", "32"))
    runs = int(os.environ.get("RUNS", "30"))

    all_variants = {
        "whole": {},  # production default for quantized predictors
        "chunk16_unroll": {"YOLO_TPU_SERVE_CHUNK": "16", "YOLO_TPU_CHUNK_MODE": "unroll"},
        "chunk16_scan": {"YOLO_TPU_SERVE_CHUNK": "16", "YOLO_TPU_CHUNK_MODE": "scan"},
    }
    variants = [(v, all_variants[v]) for v in
                os.environ.get("VARIANTS", "whole,chunk16_unroll,chunk16_scan").split(",")]
    gated = ("YOLO_TPU_SERVE_CHUNK", "YOLO_TPU_CHUNK_MODE")

    rng = np.random.default_rng(0)
    rows = {}
    for tag, env in variants:
        for k in gated:
            os.environ.pop(k, None)
        os.environ.update(env)
        try:
            # fresh model + quantizer per variant (env knobs read at trace time)
            model = YOLO11Model(f"yolo11{size}")
            q = PostTrainingQuantizer(model, {"imgsz": imgsz})
            q.set_calibration_data([rng.integers(0, 255, (2, imgsz, imgsz, 3), dtype=np.uint8)])
            qm = q.optimize()
            r = qm.benchmark(imgsz=imgsz, batch=batch, runs=runs, warmup=3)
            rows[tag] = round(r["avg_time_s"] * 1e3, 3)
            print(json.dumps({
                "size": size, "batch": batch, "variant": tag, "ms": rows[tag],
                "fps": round(r["throughput_imgs_per_s"], 1),
                "compile_s": round(r["compile_time_s"], 1),
            }), flush=True)
            del model, qm
        except Exception as e:  # noqa: BLE001 — record, keep measuring
            print(json.dumps({"variant": tag, "error": str(e)[:200]}), flush=True)
    if rows:
        best = min(rows, key=rows.get)
        print(json.dumps({"size": size, "batch": batch, "best": best, "rows_ms": rows}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
