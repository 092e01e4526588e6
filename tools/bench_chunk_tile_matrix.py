#!/usr/bin/env python
"""A/B the production serving defaults (batch-chunked subgraphs + tiled
early stage) against their gated-off variants, per size.

Why: the chunk policy (core/predictor.py _serve_chunk: detect/obb/classify,
chunk 16 at 32 <= B < 128) engages for EVERY model size, but rounds 3-4 only
measured n and m directly; and the m/b32 29.81 ms + n/b64 20.2 ms rows were
recorded BEFORE tiled-b16-subgraphs became the default (models/early.py
tiled_eligible, 8 <= B <= 16). This matrix re-measures the current defaults
and their ablations so the policy never silently loses on an unmeasured
(size, batch) cell. Each row prints as soon as it is measured (a killed run
keeps its rows).

Reference protocol parity: throughput sweep over model sizes at fixed batch
(reference benchmarks/speed_benchmark.py:61-67, 307-350), with real device
sync (the reference's timers never synchronized - SURVEY.md section 6).

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_chunk_tile_matrix.py
env: CONFIGS="n:64,s:32,m:32,l:32,x:32" RUNS=30 IMGSZ=640 TASK=detect
     VARIANTS=default,chunk_off,chunk_no_tile
"""

import json
import os
import sys


def main():
    from yolo_infer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from yolo_infer_tpu.core.model import YOLO11Model

    imgsz = int(os.environ.get("IMGSZ", "640"))
    runs = int(os.environ.get("RUNS", "30"))
    task = os.environ.get("TASK", "detect")
    suffix = {"detect": "", "pose": "-pose", "segment": "-seg", "obb": "-obb",
              "classify": "-cls"}[task]
    configs = [
        (c.split(":")[0], int(c.split(":")[1]))
        for c in os.environ.get("CONFIGS", "n:64,s:32,m:32,l:32,x:32").split(",")
    ]

    # variants: production default, chunking off (whole batch), chunking on
    # with the tiled early stage off inside the b16 subgraphs
    all_variants = {
        "default": {},
        "chunk_off": {"YOLO_TPU_SERVE_CHUNK": "0"},
        "chunk_no_tile": {"YOLO_TPU_EARLY_TILED": "0"},
        # finer split: b8 subgraphs also sit inside models/early.py's
        # tiled_eligible window (8 <= B <= 16) — is b8 faster than b16?
        "chunk8_unroll": {"YOLO_TPU_SERVE_CHUNK": "8", "YOLO_TPU_CHUNK_MODE": "unroll"},
        "chunk8_scan": {"YOLO_TPU_SERVE_CHUNK": "8", "YOLO_TPU_CHUNK_MODE": "scan"},
        # forced chunk-16 for cells where the policy default is whole (s at
        # any imgsz, everything below 640) — measures what the gate leaves
        # on the table
        "chunk16_unroll": {"YOLO_TPU_SERVE_CHUNK": "16", "YOLO_TPU_CHUNK_MODE": "unroll"},
        "chunk16_scan": {"YOLO_TPU_SERVE_CHUNK": "16", "YOLO_TPU_CHUNK_MODE": "scan"},
        # round-5 detect-tail A/B: select-then-decode (DFL on the pre_topk
        # selected rows only) and a halved candidate pool (256² IoU keep
        # kernel instead of 512²) — independently and stacked
        "seldec": {"YOLO_TPU_DETECT_SELDEC": "1"},
        "k256": {"YOLO_TPU_PRE_TOPK": "256"},
        "seldec_k256": {"YOLO_TPU_DETECT_SELDEC": "1", "YOLO_TPU_PRE_TOPK": "256"},
        # K=384 = the smallest lane-aligned pool that still honors the
        # nominal max_det=300 output contract (K=256 can emit at most 256)
        "seldec_k384": {"YOLO_TPU_DETECT_SELDEC": "1", "YOLO_TPU_PRE_TOPK": "384"},
        "seldec_off": {"YOLO_TPU_DETECT_SELDEC": "0"},
        # whole-batch NCHW early chain (models/early.py run_early_nchw) for
        # the regimes the tile path excludes — the dedicated s look (r5).
        # Tiling is explicitly disabled: forward() checks the tiled path
        # FIRST, so a tile-eligible config (e.g. n:32's b16 chunk
        # subgraphs) would otherwise measure the tiled program under this
        # label (r5 code-review finding).
        "early_nchw": {"YOLO_TPU_EARLY_NCHW": "1", "YOLO_TPU_EARLY_TILED": "0"},
    }
    variants = [
        (v, all_variants[v])
        for v in os.environ.get("VARIANTS", "default,chunk_off,chunk_no_tile").split(",")
    ]
    gated = ("YOLO_TPU_SERVE_CHUNK", "YOLO_TPU_CHUNK_MODE", "YOLO_TPU_EARLY_TILED",
             "YOLO_TPU_DETECT_SELDEC", "YOLO_TPU_PRE_TOPK", "YOLO_TPU_EARLY_NCHW")

    for size, batch in configs:
        rows = {}
        for tag, env in variants:
            for k in gated:
                os.environ.pop(k, None)
            os.environ.update(env)
            # fresh model per variant: the predictor caches jitted programs
            # per signature, and the env knobs are read at trace time
            model = YOLO11Model(f"yolo11{size}{suffix}")
            r = model.benchmark(imgsz=imgsz, batch=batch, runs=runs, warmup=3)
            rows[tag] = round(r["avg_time_s"] * 1e3, 3)
            print(json.dumps({
                "size": size, "batch": batch, "task": task, "variant": tag,
                "ms": rows[tag],
                "fps": round(r["throughput_imgs_per_s"], 1),
                "compile_s": round(r["compile_time_s"], 1),
            }), flush=True)
            del model
        best = min(rows, key=rows.get)
        print(json.dumps({"size": size, "batch": batch, "task": task,
                          "best": best, "rows_ms": rows}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
