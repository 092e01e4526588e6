#!/usr/bin/env python
"""Hardware validation-loop throughput (VERDICT r3 -> r4 item 7).

The reference's accuracy protocol runs batched val at conf=0.001 / iou=0.6 /
multi_label (reference core/validator.py:86-136); this stack's val engine had
speed rows for serving and training but none for the val loop itself. This
measures, on the real TPU:

  1. e2e `YOLO11Validator.validate` images/s on a synthetic on-disk dataset
     (JPEG decode -> letterbox -> device program -> host mAP matching,
     double-buffered) — the number an ML engineer sees per epoch;
  2. the val DEVICE PROGRAM alone (multi_label NMS, conf=0.001,
     pre_topk=4096) under the sustained queue-then-sync protocol — the
     chip-side cost with tunnel RTT amortized;
  3. tail pieces: the (A*nc,) flat candidate sort that ops/nms.py:67 says
     dominates, vs the rest of the program.

Every row prints immediately (a wedge mid-run keeps earlier rows).

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_val_loop.py
env: SIZE=n BATCHES=16,32 IMGSZ=640 N_IMAGES=256 RUNS=20
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np


def sync_leaf(x):
    import jax

    leaf = [v for v in jax.tree_util.tree_leaves(x) if v is not None][0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def bench_fn(fn, args, runs):
    out = fn(*args)
    sync_leaf(out)
    for _ in range(3):
        out = fn(*args)
    sync_leaf(out)
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(runs):
            out = fn(*args)
        sync_leaf(out)
        reps.append((time.perf_counter() - t0) / runs)
    return float(np.median(reps)) * 1e3  # ms


def make_dataset(root: Path, n_images: int, imgsz: int) -> Path:
    """Synthetic val split: JPEG images with a few colored boxes + YOLO labels."""
    import cv2
    import yaml

    (root / "images/val").mkdir(parents=True, exist_ok=True)
    (root / "labels/val").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n_images):
        img = rng.integers(0, 255, (imgsz, imgsz, 3), dtype=np.uint8)
        lines = []
        for _ in range(int(rng.integers(1, 9))):
            x0, y0 = rng.integers(0, imgsz * 3 // 5, 2)
            w, h = rng.integers(imgsz // 10, imgsz // 3, 2)
            x1, y1 = min(x0 + w, imgsz - 2), min(y0 + h, imgsz - 2)
            cv2.rectangle(img, (int(x0), int(y0)), (int(x1), int(y1)),
                          tuple(int(c) for c in rng.integers(0, 255, 3)), -1)
            c = int(rng.integers(0, 80))
            lines.append(f"{c} {(x0+x1)/2/imgsz} {(y0+y1)/2/imgsz} {(x1-x0)/imgsz} {(y1-y0)/imgsz}")
        cv2.imwrite(str(root / f"images/val/i{i:04d}.jpg"), img)
        (root / f"labels/val/i{i:04d}.txt").write_text("\n".join(lines) + "\n")
    names = {i: str(i) for i in range(80)}
    (root / "data.yaml").write_text(yaml.safe_dump(
        {"path": str(root), "train": "images/val", "val": "images/val", "names": names, "nc": 80}))
    return root / "data.yaml"


def main():
    from yolo_infer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.core.validator import YOLO11Validator
    from yolo_infer_tpu.ops.nms import _exact_topk

    size = os.environ.get("SIZE", "n")
    batches = [int(b) for b in os.environ.get("BATCHES", "16,32").split(",")]
    imgsz = int(os.environ.get("IMGSZ", "640"))
    n_images = int(os.environ.get("N_IMAGES", "256"))
    runs = int(os.environ.get("RUNS", "20"))
    pre_topk = 4096

    yaml_path = make_dataset(Path(os.environ.get("DS_DIR", "/tmp/val_bench_ds")), n_images, imgsz)
    print(json.dumps({"device": str(jax.devices()[0]), "size": size, "imgsz": imgsz,
                      "n_images": n_images, "conf": 0.001, "pre_topk": pre_topk}), flush=True)

    # chunk-policy A/B for the val program (VERDICT r4 item 2): the serving
    # chunk policy is read at trace time, so each variant gets a fresh model
    all_variants = {
        "default": {},
        "chunk_off": {"YOLO_TPU_SERVE_CHUNK": "0"},
        "chunk16_unroll": {"YOLO_TPU_SERVE_CHUNK": "16", "YOLO_TPU_CHUNK_MODE": "unroll"},
        "chunk16_scan": {"YOLO_TPU_SERVE_CHUNK": "16", "YOLO_TPU_CHUNK_MODE": "scan"},
    }
    variants = [(v, all_variants[v]) for v in os.environ.get("VARIANTS", "default").split(",")]
    gated = ("YOLO_TPU_SERVE_CHUNK", "YOLO_TPU_CHUNK_MODE")

    rng = np.random.default_rng(0)
    for tag, env in variants:
        for k in gated:
            os.environ.pop(k, None)
        os.environ.update(env)
        model = YOLO11Model(f"yolo11{size}")
        for b in batches:
            # ---- 2. the val device program, sustained (tunnel RTT amortized)
            dev_images = jnp.asarray(rng.integers(0, 255, (b, imgsz, imgsz, 3), dtype=np.uint8))

            def prog(imgs):
                return model.predictor.predict_raw(imgs, 0.001, 0.6, imgsz,
                                                   multi_label=True, pre_topk=pre_topk)

            t0 = time.perf_counter()
            sync_leaf(prog(dev_images))
            compile_s = time.perf_counter() - t0
            ms = bench_fn(prog, (dev_images,), runs)
            print(json.dumps({"size": size, "batch": b, "kind": "val_program_sustained",
                              "variant": tag, "ms_per_batch": round(ms, 3),
                              "imgs_per_s": round(b / ms * 1e3, 1),
                              "compile_s": round(compile_s, 1)}), flush=True)

            if tag != "default" or os.environ.get("SKIP_E2E", "") == "1":
                continue
            # ---- 1. e2e validate() wall-clock (decode+letterbox+device+matching)
            val = YOLO11Validator(model=model, output_dir=f"/tmp/val_bench_out_{size}_{b}")
            res = val.validate(str(yaml_path), imgsz=imgsz, batch=b, conf=0.001,
                               iou=0.6, verbose=False)  # warm epoch (compile hit above)
            res = val.validate(str(yaml_path), imgsz=imgsz, batch=b, conf=0.001,
                               iou=0.6, verbose=False)
            print(json.dumps({"size": size, "batch": b, "kind": "validate_e2e",
                              "imgs_per_s": round(res["speed"]["images_per_s"], 1),
                              "inference_ms_per_image": round(res["speed"]["inference_ms_per_image"], 3),
                              "total_s": round(res["speed"]["total_s"], 2),
                              "mAP50": round(res["metrics"]["mAP50"], 4)}), flush=True)
        del model

    # ---- 3. tail piece: the flat (A*nc,) candidate sort alone, per batch
    a_total = sum((imgsz // s) ** 2 for s in (8, 16, 32))
    nc = 80
    for b in batches:
        flat = jnp.asarray(rng.standard_normal((b, a_total * nc)).astype(np.float32))
        ms = bench_fn(jax.jit(lambda f: _exact_topk(f, pre_topk)), (flat,), runs)
        print(json.dumps({"size": size, "batch": b, "kind": "flat_sort_672k",
                          "A_nc": a_total * nc, "ms_per_batch": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
