#!/usr/bin/env python
"""Dynamic-int8 export (analog of reference official_scripts/export_dynamic.py:
1-4, which exported OpenVINO dynamic int8). Here: per-channel int8 weights
with on-device dynamic activation scales, saved as a native checkpoint.

Usage: python scripts/export_dynamic.py yolo11n --output yolo11n_int8.msgpack
"""

import argparse


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("model")
    p.add_argument("--output", default=None)
    args = p.parse_args()

    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.optimization.quantization.quantizers import DynamicQuantizer, QuantizationUtils

    model = YOLO11Model(args.model)
    q = DynamicQuantizer(model)
    q.optimize()
    out = q.save_optimized_model(args.output or f"{args.model}_dynamic_int8.msgpack")
    sizes = QuantizationUtils.compare_model_sizes(model, q.optimized_model)
    print(f"saved {out}; compression {sizes['compression_ratio']:.2f}x "
          f"({sizes['original_mb']:.1f} -> {sizes['quantized_mb']:.1f} MB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
