#!/usr/bin/env python
"""Capture a jax.profiler trace of the e2e serving program and rank device ops.

The round-3 verdict asks for a trace-backed attribution of the n/b32
small-batch gap (VERDICT r3 item 1). This captures `jax.profiler.trace`
around the sustained loop (BENCH_PROFILE plumbing already exists in
core/model.py benchmark) and then post-processes the Chrome-trace JSON the
profiler writes: per-op total device time, grouped by fusion/op name, top-N
printed as JSON rows.

If the axon tunnel backend does not export device lanes, the trace will only
contain host events — the tool says so instead of printing garbage.

PYTHONPATH=/root/repo:/root/.axon_site python tools/trace_ops.py
env: SIZE=n BATCH=32 IMGSZ=640 RUNS=30 TRACE_DIR=/tmp/trace_b32 TOP=40
Analyze an existing dir without touching the TPU: ANALYZE_ONLY=1
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def analyze(trace_dir: str, top: int = 40):
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        print(json.dumps({"error": "no *.trace.json.gz under " + trace_dir}))
        return 1
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    # device lanes: XLA TPU traces name them like "/device:TPU:0" or "TPU Core"
    dev_pids = {pid for pid, name in pid_names.items()
                if any(t in name for t in ("TPU", "device:", "Device", "XLA Op"))
                and "Host" not in name and "python" not in name.lower()}
    total_by_op = defaultdict(float)
    count_by_op = defaultdict(int)
    dev_events = 0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))  # us
        total_by_op[name] += dur
        count_by_op[name] += 1
        dev_events += 1
    if not dev_events:
        print(json.dumps({"error": "trace has no device-lane events",
                          "lanes": sorted(set(pid_names.values()))[:20]}))
        return 1
    rows = sorted(total_by_op.items(), key=lambda kv: -kv[1])
    grand = sum(total_by_op.values())
    print(json.dumps({"trace": paths[-1], "device_events": dev_events,
                      "total_device_us": round(grand, 1),
                      "lanes": sorted(pid_names[p] for p in dev_pids)}), flush=True)
    for name, us in rows[:top]:
        print(json.dumps({"op": name[:120], "total_us": round(us, 1),
                          "pct": round(100 * us / grand, 2),
                          "count": count_by_op[name]}), flush=True)
    return 0


def main():
    trace_dir = os.environ.get("TRACE_DIR", "/tmp/trace_b32")
    top = int(os.environ.get("TOP", "40"))
    if os.environ.get("ANALYZE_ONLY", "0") == "1":
        return analyze(trace_dir, top)

    from yolo_infer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from yolo_infer_tpu.core.model import YOLO11Model

    size = os.environ.get("SIZE", "n")
    batch = int(os.environ.get("BATCH", "32"))
    imgsz = int(os.environ.get("IMGSZ", "640"))
    runs = int(os.environ.get("RUNS", "30"))
    model = YOLO11Model(f"yolo11{size}")
    result = model.benchmark(imgsz=imgsz, batch=batch, runs=runs, warmup=5,
                             profile_dir=trace_dir)
    print(json.dumps({"size": size, "batch": batch,
                      "sustained_ms": round(result["avg_time_s"] * 1e3, 3),
                      "fps": round(result["throughput_imgs_per_s"], 1)}), flush=True)
    return analyze(trace_dir, top)


if __name__ == "__main__":
    sys.exit(main())
