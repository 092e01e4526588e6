#!/usr/bin/env python
"""Ablate the static8 int8 path: where does the e2e slowdown vs bf16 come from?

Times the FORWARD ONLY (no decode/NMS) of yolo11n@640 under variants:
  bf16        — the serving baseline
  s8          — static8 default (f32 epilogue)
  s8_bf16ep   — static8 with bf16 epilogue
  s8_nostem   — static8 with the first K convs exempted (run fp)
  s8_allfp    — every quantized conv exempted (isolates dequant overhead)

Run on the real TPU: PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate_int8.py
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.models.yolo11 import forward
    from yolo_infer_tpu.nn.quantize import QuantContext, quant_context
    from yolo_infer_tpu.ops.preprocess import preprocess_batch
    from yolo_infer_tpu.optimization.quantization.quantizers import PostTrainingQuantizer

    size = os.environ.get("SIZE", "n")
    imgsz = int(os.environ.get("IMGSZ", "640"))
    batches = [int(b) for b in os.environ.get("BATCHES", "32,128").split(",")]
    runs = int(os.environ.get("RUNS", "30"))

    model = YOLO11Model(f"yolo11{size}")
    rng = np.random.default_rng(0)
    q = PostTrainingQuantizer(model, {"imgsz": imgsz})
    q.set_calibration_data([rng.integers(0, 255, (2, imgsz, imgsz, 3), dtype=np.uint8) for _ in range(2)])
    qmodel = q.optimize()
    scales = qmodel.quant_act_scales
    n_convs = scales.shape[0]
    print(json.dumps({"n_quantized_convs": int(n_convs)}), flush=True)

    spec = model.spec

    def make_fn(kind):
        @jax.jit
        def run(p, images):
            x = preprocess_batch(images, out_hw=(imgsz, imgsz), dtype=jnp.bfloat16)
            if kind == "bf16":
                out, _ = forward(p, None, spec, x, compute_dtype=jnp.bfloat16)
                return out["feats"][0]
            opts = {}
            if kind == "s8_bf16ep":
                opts["epilogue_dtype"] = jnp.bfloat16
            if kind == "s8_nostem":
                opts["float_convs"] = set(range(4))
            if kind == "s8_allfp":
                opts["float_convs"] = set(range(n_convs))
            with quant_context(QuantContext("static8", act_scales=scales, **opts)):
                out, _ = forward(p, None, spec, x, compute_dtype=jnp.bfloat16)
            return out["feats"][0]

        return run

    def sync(x):
        np.asarray(jax.device_get(x.ravel()[:1]))

    for batch in batches:
        images = jnp.asarray(rng.integers(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8))
        row = {"batch": batch}
        base = None
        for kind in ("bf16", "s8", "s8_bf16ep", "s8_nostem", "s8_allfp"):
            p = model.deploy_params if kind == "bf16" else qmodel.deploy_params
            fn = make_fn(kind)
            out = fn(p, images)
            sync(out)
            for _ in range(5):
                out = fn(p, images)
            sync(out)
            t0 = time.perf_counter()
            for _ in range(runs):
                out = fn(p, images)
            sync(out)
            dt = (time.perf_counter() - t0) / runs
            row[kind + "_ms"] = round(dt * 1e3, 3)
            if kind == "bf16":
                base = dt
            else:
                row[kind + "_speedup"] = round(base / dt, 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    sys.exit(main())
