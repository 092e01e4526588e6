#!/usr/bin/env python
"""Train starting from a quantized checkpoint (analog of reference
official_scripts/train.py:1-13, which trained from an int8 OpenVINO export):
loads an int8 model's float shadow (dequantized), fine-tunes with QAT.

Usage: python scripts/train.py yolo11n_dynamic_int8.msgpack --data d.yaml --epochs 10
"""

import argparse
import json


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("model")
    p.add_argument("--data", required=True)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--imgsz", type=int, default=640)
    args = p.parse_args()

    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.core.trainer import TrainingConfig, YOLO11Trainer

    model = YOLO11Model(args.model)
    cfg = TrainingConfig(
        data=args.data, epochs=args.epochs, batch=args.batch, imgsz=args.imgsz,
        qat=True, lr0=1e-4, name="train_from_int8",
    )
    out = YOLO11Trainer(model=model, config=cfg).train()
    print(json.dumps({k: v for k, v in out.items() if k != "history"}, indent=2, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
