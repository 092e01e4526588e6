#!/usr/bin/env python
"""Segment serving throughput: device-resident lazy masks vs the host paths.

VERDICT r2 #5 done-criterion: seg serving throughput >= 2x the host path.
Times the FULL predict() surface (device inference + Results building) for
the Predictor mask modes on identical inputs:

  device       in-graph sigmoid->crop->bilinear-upsample->threshold->bitpack
               (the whole ultralytics process_mask(upsample=True).gt_(0.5)
               pipeline on the accelerator); Results.masks is a LazyMasks
               view that is NOT read — the serving regime, masks stay on
               device exactly like the reference's CUDA Results tensors
  device_read  same, then np.asarray() on every mask (pays the bit-packed
               transfer + host unpackbits)
  exact        the round-2 host float path (numpy matmul/sigmoid/cv2-resize
               per image) — the oracle the >=2x criterion compares against

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_seg_masks.py
env: SIZE=n B=32 IMGSZ=640 RUNS=10 EXACT_RUNS=1 CONF=0.0 SKIP_EXACT=0
"""

import json
import os
import sys
import time

import numpy as np


def main():
    from yolo_infer_tpu.core.predictor import Predictor
    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    size = os.environ.get("SIZE", "n")
    b = int(os.environ.get("B", "32"))
    imgsz = int(os.environ.get("IMGSZ", "640"))
    runs = int(os.environ.get("RUNS", "10"))
    exact_runs = int(os.environ.get("EXACT_RUNS", "1"))
    conf = float(os.environ.get("CONF", "0.0"))  # 0.0 stresses the mask path

    model = YOLO11Model(f"yolo11{size}-seg")
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (imgsz, imgsz, 3), dtype=np.uint8) for _ in range(b)]

    out = {"size": size, "batch": b, "imgsz": imgsz, "conf": conf}

    def emit():
        # progressive supersets — tunnel weather can kill a phase; every
        # completed row must already be on disk (last line = full record)
        print(json.dumps(out), flush=True)

    def timed(fn, n_runs, warmup):
        for _ in range(warmup):
            fn()
        t0 = time.perf_counter()
        for _ in range(n_runs):
            res = fn()
        dt = (time.perf_counter() - t0) / n_runs
        return dt, res

    # -- device (lazy, serving regime) + device_read ------------------------
    p = Predictor(model.deploy_params, model.spec, compute_dtype=model.compute_dtype,
                  names=model.names, mask_mode="device")
    t0 = time.perf_counter()
    res = p.predict(imgs, conf=conf, imgsz=imgsz)
    out["device_compile_s"] = round(time.perf_counter() - t0, 1)
    out["n_dets"] = int(sum(len(r) for r in res))
    emit()

    dt, _ = timed(lambda: p.predict(imgs, conf=conf, imgsz=imgsz), runs, warmup=2)
    out["device_imgs_per_s"] = round(b / dt, 1)
    out["device_ms_per_batch"] = round(dt * 1e3, 2)
    emit()

    def read_all():
        res = p.predict(imgs, conf=conf, imgsz=imgsz)
        for r in res:
            if r.masks is not None:
                np.asarray(r.masks)
        return res

    dt, _ = timed(read_all, max(2, runs // 4), warmup=1)
    out["device_read_imgs_per_s"] = round(b / dt, 1)
    out["device_read_ms_per_batch"] = round(dt * 1e3, 2)
    emit()

    # realistic serving conf on the SAME compiled program (conf is traced)
    def read_all_conf25():
        res = p.predict(imgs, conf=0.25, imgsz=imgsz)
        for r in res:
            if r.masks is not None:
                np.asarray(r.masks)
        return res

    dt, res25 = timed(read_all_conf25, max(2, runs // 4), warmup=1)
    out["device_read_conf25_imgs_per_s"] = round(b / dt, 1)
    out["device_read_conf25_n_dets"] = int(sum(len(r) for r in res25))
    emit()

    # -- device_half: half-grid threshold, 4x less transfer on read ----------
    if os.environ.get("SKIP_HALF", "0") != "1":
        ph = Predictor(model.deploy_params, model.spec, compute_dtype=model.compute_dtype,
                       names=model.names, mask_mode="device_half")
        t0 = time.perf_counter()
        ph.predict(imgs, conf=conf, imgsz=imgsz)
        out["half_compile_s"] = round(time.perf_counter() - t0, 1)
        emit()
        dt, _ = timed(lambda: ph.predict(imgs, conf=conf, imgsz=imgsz), runs, warmup=2)
        out["half_imgs_per_s"] = round(b / dt, 1)
        out["half_ms_per_batch"] = round(dt * 1e3, 2)
        emit()

        def read_all_half():
            res = ph.predict(imgs, conf=conf, imgsz=imgsz)
            for r in res:
                if r.masks is not None:
                    np.asarray(r.masks)
            return res

        dt, _ = timed(read_all_half, max(2, runs // 4), warmup=1)
        out["half_read_imgs_per_s"] = round(b / dt, 1)
        out["half_read_ms_per_batch"] = round(dt * 1e3, 2)
        emit()

    # -- exact host-float oracle -------------------------------------------
    if os.environ.get("SKIP_EXACT", "0") != "1":
        pe = Predictor(model.deploy_params, model.spec, compute_dtype=model.compute_dtype,
                       names=model.names, mask_mode="exact")
        t0 = time.perf_counter()
        pe.predict(imgs, conf=conf, imgsz=imgsz)
        out["exact_compile_s"] = round(time.perf_counter() - t0, 1)
        emit()
        dt, _ = timed(lambda: pe.predict(imgs, conf=conf, imgsz=imgsz), exact_runs, warmup=0)
        out["exact_imgs_per_s"] = round(b / dt, 1)
        out["exact_ms_per_batch"] = round(dt * 1e3, 2)
        out["device_vs_exact"] = round(out["device_imgs_per_s"] / out["exact_imgs_per_s"], 2)
        out["device_read_vs_exact"] = round(out["device_read_imgs_per_s"] / out["exact_imgs_per_s"], 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    sys.exit(main())
