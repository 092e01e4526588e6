#!/usr/bin/env python
"""Exported-artifact batch-1 device latency (VERDICT r4 item 9).

The portable serving claim ("b1 1.6-1.7 ms device; a PCIe host adds ~0.1 ms
upload, the tunnel adds ~30 ms RTT") was derived from the LIVE predictor's
b1 row. This measures the AOT artifact itself: export the full b1@640
pipeline via jax.export (scripts/model_export.py --format jaxexport),
reload it with ExportedPredictor.load — no model code, no spec, weights
baked — and time the artifact under the sustained queue-then-sync protocol
(a per-call sync measures the tunnel, CLAUDE.md).

Reference protocol parity: b1 latency loop, reference
benchmarks/speed_benchmark.py:34-39, 307-350 (their exported-model analog
is the ONNX/OpenVINO path of official_scripts/model_export.py:1-7).

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_exported_b1.py
env: SIZE=n IMGSZ=640 RUNS=100 BATCH=1
"""

import json
import os
import sys
import time

import numpy as np


def main() -> int:
    from yolo_infer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from yolo_infer_tpu.core.exported import ExportedPredictor, export_predictor
    from yolo_infer_tpu.core.model import YOLO11Model

    size = os.environ.get("SIZE", "n")
    imgsz = int(os.environ.get("IMGSZ", "640"))
    runs = int(os.environ.get("RUNS", "100"))
    batch = int(os.environ.get("BATCH", "1"))

    model = YOLO11Model(f"yolo11{size}")
    path = f"/tmp/yolo11{size}_b{batch}_{imgsz}.jaxexp"
    t0 = time.perf_counter()
    export_predictor(model, path, batch=batch, imgsz=imgsz)
    export_s = time.perf_counter() - t0
    art_mb = os.path.getsize(path) / 1e6

    # live-predictor control: same process, same protocol — isolates any
    # exported-artifact overhead from weather/protocol differences
    rng0 = np.random.default_rng(0)
    live_dev = jnp.asarray(rng0.integers(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8))

    def live_once():
        out = model.predictor.predict_raw(live_dev, 0.25, 0.45, imgsz)
        np.asarray(out["num"])
        return out

    live_once()
    for _ in range(5):
        live_once()
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(runs - 1):
            model.predictor.predict_raw(live_dev, 0.25, 0.45, imgsz)
        live_once()
        reps.append((time.perf_counter() - t0) / runs)
    live_ms = float(np.median(reps)) * 1e3
    print(json.dumps({"kind": "live_control", "size": size, "batch": batch,
                      "device_ms_per_batch": round(live_ms, 3)}), flush=True)
    del model

    pred = ExportedPredictor.load(path)
    rng = np.random.default_rng(0)
    dev = jnp.asarray(rng.integers(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8))

    def once():
        out = pred.predict_raw(dev, 0.25, 0.45)
        np.asarray(out["num"])  # real sync (block_until_ready is a tunnel no-op)
        return out

    t0 = time.perf_counter()
    once()
    first_call_s = time.perf_counter() - t0
    for _ in range(5):
        once()
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(runs - 1):
            pred.predict_raw(dev, 0.25, 0.45)
        once()
        reps.append((time.perf_counter() - t0) / runs)
    dev_ms = float(np.median(reps)) * 1e3
    # per-call (RTT-inclusive) latency for the tunnel context
    t0 = time.perf_counter()
    for _ in range(10):
        once()
    percall_ms = (time.perf_counter() - t0) / 10 * 1e3
    print(json.dumps({
        "kind": "exported_artifact_latency", "size": size, "batch": batch,
        "imgsz": imgsz, "artifact_mb": round(art_mb, 1),
        "export_s": round(export_s, 1), "first_call_s": round(first_call_s, 1),
        "device_ms_per_batch": round(dev_ms, 3),
        "imgs_per_s": round(batch / dev_ms * 1e3, 1),
        "percall_ms_with_rtt": round(percall_ms, 1),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
