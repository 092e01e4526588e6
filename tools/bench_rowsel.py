#!/usr/bin/env python
"""A/B the post-NMS anchor-row selection impl (ops/select.py) on hardware.

The pose/segment serving tails pull max_det rows from the full anchor grid
((B, 8400, 51) / (B, 8400, 32) at 640). take_along_axis lowers to a TPU row
gather at slice widths (51/32 elems) below one lane register — the scalar-
gather regime that cost the training losses 10-20x. The 'onehot' impl is a
(B, K, A) MXU contraction instead. This measures both THROUGH the full
predict program (sustained queue-then-sync protocol via model.benchmark),
plus the pose chunk A/B under the winning impl: pose previously measured
"chunking neutral" (ab_chunk3) — if the gather was serializing the tail,
chunking may start paying once it is gone.

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_rowsel.py
env: SIZE=n B=32 IMGSZ=640 RUNS=30 TASKS=pose,segment
"""

import json
import os
import sys


def main():
    from yolo_infer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from yolo_infer_tpu.core.model import YOLO11Model

    size = os.environ.get("SIZE", "n")
    b = int(os.environ.get("B", "32"))
    imgsz = int(os.environ.get("IMGSZ", "640"))
    runs = int(os.environ.get("RUNS", "30"))
    tasks = os.environ.get("TASKS", "pose,segment").split(",")
    suffix = {"pose": "-pose", "segment": "-seg", "detect": ""}

    def bench(task, env):
        for k in ("YOLO_TPU_ROWSEL", "YOLO_TPU_SERVE_CHUNK", "YOLO_TPU_CHUNK_MODE"):
            os.environ.pop(k, None)
        os.environ.update(env)
        model = YOLO11Model(f"yolo11{size}{suffix[task]}")
        r = model.benchmark(imgsz=imgsz, batch=b, runs=runs, warmup=3)
        row = {"task": task, "size": size, "batch": b, **env,
               "ms": round(r["avg_time_s"] * 1e3, 3),
               "fps": round(r["throughput_imgs_per_s"], 1),
               "compile_s": round(r["compile_time_s"], 1)}
        print(json.dumps(row), flush=True)
        return row["ms"]

    for task in tasks:
        g = bench(task, {"YOLO_TPU_ROWSEL": "gather"})
        o = bench(task, {"YOLO_TPU_ROWSEL": "onehot"})
        best = "onehot" if o < g else "gather"
        print(json.dumps({"task": task, "best": best,
                          "gather_ms": g, "onehot_ms": o}), flush=True)
        if task == "pose" or os.environ.get("CHUNK_CELL", "") == "1":
            # does chunking start to pay once the tail isn't gather-bound?
            for mode in os.environ.get("CHUNK_MODES", "unroll").split(","):
                c = bench(task, {"YOLO_TPU_ROWSEL": best,
                                 "YOLO_TPU_SERVE_CHUNK": "16",
                                 "YOLO_TPU_CHUNK_MODE": mode})
                print(json.dumps({"task": f"{task}_chunk16_{mode}", "best_impl": best,
                                  "chunk_ms": c, "whole_ms": min(g, o)}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
