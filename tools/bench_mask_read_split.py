#!/usr/bin/env python
"""Split the LazyMasks consumption cost: tunnel transfer vs host bit-unpack.

VERDICT r3 item 2 asked for the 67 ms/image/30-rows read to be (1) split
into its transfer and unpack legs and (2) reduced. The reduction landed as
the banded transfer + batch prefetch (core/predictor.py LazyMasks); this
measures the legs so the remaining floor is attributable:

  rtt_bw      fetch-latency curve over payload sizes -> RTT intercept and
              device->host bandwidth slope (the environment's floor)
  read_640    LazyMasks.numpy() per image, 30 rows, square source (no band
              win: the content region IS the full 640 grid)
  read_480p   same with an 854x480 source — the banded transfer skips the
              letterbox padding rows (~25% of bytes at this aspect)
  unpack      host np.unpackbits leg alone, same shapes
  prefetch    32-image batch read via LazyMasks.prefetch vs a per-image loop
              (RTT amortization — one sliced fetch per batch buffer)

Reference semantic: Results.masks consumption (reference
detection_demo.py:116-134 reads masks synchronously per frame).

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_mask_read_split.py
env: SIZE=n B=32 IMGSZ=640 ROWS=30 REPS=7
"""

import json
import os
import sys
import time

import numpy as np


def median_time(fn, reps, warmup=1):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.core.predictor import LazyMasks
    from yolo_infer_tpu.ops.masks import unpack_mask_bits
    from yolo_infer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    size = os.environ.get("SIZE", "n")
    b = int(os.environ.get("B", "32"))
    imgsz = int(os.environ.get("IMGSZ", "640"))
    rows = int(os.environ.get("ROWS", "30"))
    reps = int(os.environ.get("REPS", "7"))

    out = {"size": size, "batch": b, "imgsz": imgsz, "rows": rows}

    def emit():
        print(json.dumps(out), flush=True)

    # -- 1. fetch-latency curve: RTT intercept + bandwidth slope -------------
    @jax.jit
    def ident(x):
        return x + 1

    sizes = [64, 65536, 524288, 1572864, 6291456]  # bytes
    curve = []
    for nbytes in sizes:
        # fetch a FRESH same-shape slice each rep: jax caches the host copy
        # of an already-fetched array (np.asarray of the same object is free
        # the second time), and the LazyMasks read path is exactly a sliced
        # fetch (dispatch the slice op + pull the result)
        dev = ident(jnp.zeros((nbytes + reps + 2,), jnp.uint8))
        np.asarray(dev[:1])  # materialize the buffer itself
        it = iter(range(1000))
        t = median_time(lambda d=dev: np.asarray(d[(i := next(it) % 4):i + nbytes]), reps, warmup=2)
        curve.append({"bytes": nbytes, "ms": round(t * 1e3, 2)})
    # least-squares t = rtt + bytes/bw over the curve
    xs = np.array([c["bytes"] for c in curve], np.float64)
    ys = np.array([c["ms"] / 1e3 for c in curve], np.float64)
    slope, intercept = np.polyfit(xs, ys, 1)
    out["fetch_curve"] = curve
    out["fetch_rtt_ms"] = round(intercept * 1e3, 2)
    out["fetch_bw_mb_s"] = round(1 / slope / 1e6, 1)
    emit()

    # -- 2. real LazyMasks reads on both aspects -----------------------------
    model = YOLO11Model(f"yolo11{size}-seg")
    rng = np.random.default_rng(0)

    for tag, shape in (("640", (imgsz, imgsz, 3)), ("480p", (480, 854, 3))):
        imgs = [rng.integers(0, 255, shape, dtype=np.uint8) for _ in range(b)]
        res = model.predictor.predict(imgs, conf=0.0, imgsz=imgsz)
        lms = [r.masks for r in res]
        assert isinstance(lms[0], LazyMasks)
        for m in lms:
            m._n = rows  # fixed row budget (random-init weights -> num=0/300)

        # per-image read: fresh lazy views each rep so nothing is cached
        def one_image():
            m = lms[0]
            m._np = None
            m._dev = dev_buf
            return m.numpy()

        dev_buf = lms[0]._dev
        t_img = median_time(one_image, reps, warmup=1)
        band_h = lms[0].shape[1]
        payload = rows * band_h * ((lms[0].shape[2] + 7) // 8 + 1)
        out[f"read_{tag}_ms_per_image"] = round(t_img * 1e3, 1)
        out[f"read_{tag}_band_rows"] = band_h
        out[f"read_{tag}_payload_kb"] = round(payload / 1024, 1)

        # unpack leg alone (host, same bytes)
        packed = np.asarray(np.random.default_rng(1).integers(
            0, 255, (rows, band_h, imgsz // 8), dtype=np.uint8))
        t_unpack = median_time(lambda: unpack_mask_bits(packed), reps, warmup=2)
        out[f"unpack_{tag}_ms"] = round(t_unpack * 1e3, 2)

        # batch prefetch vs per-image loop
        def reset():
            for m in lms:
                m._np, m._dev = None, dev_buf

        def loop_read():
            reset()
            for m in lms:
                m.numpy()

        def prefetch_read():
            reset()
            LazyMasks.prefetch(lms)

        def prefetch_u8():
            reset()
            LazyMasks.prefetch(lms, dtype=np.uint8)

        t_loop = median_time(loop_read, max(3, reps // 2), warmup=1)
        t_pre = median_time(prefetch_read, max(3, reps // 2), warmup=1)
        t_pre8 = median_time(prefetch_u8, max(3, reps // 2), warmup=1)
        out[f"batch{b}_{tag}_loop_ms_per_image"] = round(t_loop / b * 1e3, 1)
        out[f"batch{b}_{tag}_prefetch_ms_per_image"] = round(t_pre / b * 1e3, 1)
        out[f"batch{b}_{tag}_prefetch_u8_ms_per_image"] = round(t_pre8 / b * 1e3, 1)
        emit()

    # -- 2b. device_half mode: half-grid threshold, 4x less transfer ----------
    from yolo_infer_tpu.core.predictor import Predictor

    p = model.predictor
    p_half = Predictor(p.params, p.spec, compute_dtype=p.compute_dtype,
                       names=p.names, mask_mode="device_half")
    for tag, shape in (("640", (imgsz, imgsz, 3)), ("480p", (480, 854, 3))):
        imgs = [rng.integers(0, 255, shape, dtype=np.uint8) for _ in range(b)]
        res = p_half.predict(imgs, conf=0.0, imgsz=imgsz)
        lms = [r.masks for r in res]
        assert isinstance(lms[0], LazyMasks) and lms[0]._scale == 2
        for m in lms:
            m._n = rows
        dev_buf = lms[0]._dev

        def reset():
            for m in lms:
                m._np, m._dev = None, dev_buf

        def prefetch_u8():
            reset()
            LazyMasks.prefetch(lms, dtype=np.uint8)

        def one_image():
            m = lms[0]
            m._np, m._dev = None, dev_buf
            return m.numpy()

        t_img = median_time(one_image, reps, warmup=1)
        t_pre8 = median_time(prefetch_u8, max(3, reps // 2), warmup=1)
        out[f"half_read_{tag}_ms_per_image"] = round(t_img * 1e3, 1)
        out[f"half_batch{b}_{tag}_prefetch_u8_ms_per_image"] = round(t_pre8 / b * 1e3, 1)
        emit()

    # -- 3. floor accounting --------------------------------------------------
    kb = out["read_640_payload_kb"]
    floor = out["fetch_rtt_ms"] + kb * 1024 / (out["fetch_bw_mb_s"] * 1e6) * 1e3
    out["read_640_env_floor_ms"] = round(floor, 1)
    out["note"] = ("env_floor = tunnel RTT + payload/bandwidth for the banded "
                   "bit-packed transfer; on a PCIe-attached host the same "
                   "payload moves in <0.2 ms")
    emit()


if __name__ == "__main__":
    sys.exit(main())
