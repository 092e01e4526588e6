#!/usr/bin/env python
"""Segment serving throughput: device mask assembly vs the host float path.

VERDICT r2 #5 done-criterion: seg val/serving throughput >= 2x the host
path. Times the FULL predict() surface (device inference + mask assembly +
host Results building) for both Predictor mask modes on identical inputs.

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_seg_masks.py
env: SIZE=n B=32 IMGSZ=640 RUNS=8
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax.numpy as jnp

    from yolo_infer_tpu.core.predictor import Predictor
    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    size = os.environ.get("SIZE", "n")
    b = int(os.environ.get("B", "32"))
    imgsz = int(os.environ.get("IMGSZ", "640"))
    runs = int(os.environ.get("RUNS", "8"))

    model = YOLO11Model(f"yolo11{size}-seg")
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (imgsz, imgsz, 3), dtype=np.uint8) for _ in range(b)]
    # conf=0 saturates max_det (300 masks/image): the mask-bound regime where
    # the host-vs-device assembly difference is what's being measured
    conf = float(os.environ.get("CONF", "0.0"))

    out = {"size": size, "batch": b, "imgsz": imgsz}
    for mode in ("device", "exact"):
        p = Predictor(model.deploy_params, model.spec, compute_dtype=model.compute_dtype,
                      names=model.names, mask_mode=mode)
        t0 = time.perf_counter()
        res = p.predict(imgs, conf=conf, imgsz=imgsz)
        out[f"{mode}_compile_s"] = round(time.perf_counter() - t0, 1)
        for _ in range(2):
            res = p.predict(imgs, conf=conf, imgsz=imgsz)
        t0 = time.perf_counter()
        for _ in range(runs):
            res = p.predict(imgs, conf=conf, imgsz=imgsz)
        dt = (time.perf_counter() - t0) / runs
        out[f"{mode}_imgs_per_s"] = round(b / dt, 1)
        out[f"{mode}_ms_per_batch"] = round(dt * 1e3, 2)
        out[f"{mode}_n_dets"] = int(sum(len(r) for r in res))
    if out.get("exact_imgs_per_s"):
        out["device_vs_exact"] = round(out["device_imgs_per_s"] / out["exact_imgs_per_s"], 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    sys.exit(main())
