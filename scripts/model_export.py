#!/usr/bin/env python
"""Export a model for deployment (analog of reference official_scripts/
model_export.py:1-7, which exported to ONNX). TPU-native deployment targets:

  msgpack      — the framework's native fused checkpoint
  safetensors  — flat tensor archive for interop
  jaxexport    — self-contained AOT serving artifact (jax.export): the full
                 pipeline with weights baked, loadable WITHOUT model code via
                 yolo_infer_tpu.core.exported.ExportedPredictor.load
  stablehlo    — the jitted end-to-end program's StableHLO text (the XLA
                 deployment IR; what ONNX is to the torch world)

Usage: python scripts/model_export.py yolo11n --format stablehlo --imgsz 640
"""

import argparse
from pathlib import Path


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("model", help="model name (.pt/.msgpack path or yolo11[nsmlx] name)")
    p.add_argument("--format", default="msgpack", choices=["msgpack", "safetensors", "stablehlo", "jaxexport"])
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--output", default=None)
    args = p.parse_args()

    from yolo_infer_tpu.core.model import YOLO11Model

    model = YOLO11Model(args.model)
    if args.format in ("msgpack", "safetensors"):
        out = model.export(args.output, format=args.format)
        print(f"exported {args.format}: {out}")
        return 0

    if args.format == "jaxexport":
        from yolo_infer_tpu.core.exported import export_predictor

        out = export_predictor(
            model, args.output or f"{Path(args.model).stem}_b{args.batch}_{args.imgsz}.jaxexp",
            batch=args.batch, imgsz=args.imgsz)
        print(f"exported jax.export artifact: {out} ({out.stat().st_size} bytes)")
        return 0

    # stablehlo: lower the full jitted pipeline and dump the module text
    import jax
    import jax.numpy as jnp
    import numpy as np

    run = model.predictor._get(args.batch, (args.imgsz, args.imgsz), args.imgsz, False, 300)
    images = jnp.asarray(np.zeros((args.batch, args.imgsz, args.imgsz, 3), np.uint8))
    lowered = jax.jit(run).lower(model.deploy_params, images, jnp.float32(0.25), jnp.float32(0.45))
    text = lowered.as_text()
    out = Path(args.output or f"{Path(args.model).stem}_{args.imgsz}.stablehlo.mlir")
    out.write_text(text)
    print(f"exported stablehlo ({len(text)} chars): {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
