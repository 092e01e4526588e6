#!/usr/bin/env python
"""Validation with a confusion matrix (analog of reference official_scripts/
val_matrix.py:1-6).

Usage: python scripts/val_matrix.py yolo11n --data coco128.yaml
"""

import argparse
import json


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("model")
    p.add_argument("--data", required=True)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=16)
    args = p.parse_args()

    from yolo_infer_tpu.core.validator import YOLO11Validator

    v = YOLO11Validator(model_path=args.model)
    out = v.validate(args.data, imgsz=args.imgsz, batch=args.batch, confusion_matrix=True)
    print(json.dumps(out["metrics"], indent=2))
    print(f"confusion matrix written to {v.output_dir / 'confusion_matrix.txt'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
