#!/usr/bin/env python
"""Quick API benchmark (analog of reference official_scripts/benchmark.py:
1-12, which ran the ultralytics benchmark API with openvino+half). Here:
bf16 + dynamic-int8 comparison on TPU.

Usage: python scripts/benchmark.py yolo11n --imgsz 640 --batch 32
"""

import argparse
import json


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("model", nargs="?", default="yolo11n")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--runs", type=int, default=50)
    p.add_argument("--int8", action="store_true", help="also benchmark dynamic-int8")
    args = p.parse_args()

    from yolo_infer_tpu.core.model import YOLO11Model

    model = YOLO11Model(args.model)
    out = {"bf16": model.benchmark(imgsz=args.imgsz, batch=args.batch, runs=args.runs)}
    if args.int8:
        from yolo_infer_tpu.optimization.quantization.quantizers import DynamicQuantizer

        qmodel = DynamicQuantizer(model).optimize()
        out["int8_dynamic"] = qmodel.benchmark(imgsz=args.imgsz, batch=args.batch, runs=args.runs)
        out["speedup"] = out["bf16"]["avg_time_s"] / out["int8_dynamic"]["avg_time_s"]
    print(json.dumps(out, indent=2, default=float))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
