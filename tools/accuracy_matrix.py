#!/usr/bin/env python
"""Emit the speed x accuracy matrix rows: fidelity-mAP delta per variant.

Pairs every optimization speed row (PERF_MATRIX.json) with an accuracy row
in mAP units (VERDICT r3 #4), using the planted-GT two-pipeline protocol of
tests/test_fidelity_map.py: the independent torch pipeline's high-confidence
detections become GT; each variant pipeline is evaluated at low conf and
scored with the brute-force AP oracle; the row is |delta| vs the torch
pipeline's own score. Variants:

  bf16              the serving default (vs f32 torch reference)
  int8_static8      PTQ int8 residency with the PRODUCTION eligibility table
                    (the exact config of the int8 speed rows)
  int8_all_convs    int8 forced at every conv (informational worst case)
  int8_weight_only  int8-stored weights, bf16 compute
  slim0.5           physical channel surgery keep=0.5 RAW (pre fine-tune;
                    recovery is gated in tools/overfit_check.py --surgery)

Accuracy is backend-independent (same rounding on CPU and TPU), so this
runs anywhere:  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo:/root/repo/tests \
    python tools/accuracy_matrix.py --sizes n,m
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))


def run_size(size: str, imgsz: int = 128, nc: int = 4):
    import torch

    import jax.numpy as jnp

    import test_fidelity_map as F
    from golden_common import golden_state_dict
    from torch_ref import TorchYOLO11

    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.core.predictor import Predictor
    from yolo_infer_tpu.models import build_spec
    from yolo_infer_tpu.models.convert import convert_state_dict
    from yolo_infer_tpu.models.yolo11 import fold_model
    from yolo_infer_tpu.optimization.quantization.quantizers import PostTrainingQuantizer
    from yolo_infer_tpu.optimization.surgery import slim_model

    F.IMGSZ = imgsz  # the numpy pipeline reads module-level geometry
    spec = build_spec("detect", size, nc=nc)
    tmodel = TorchYOLO11(spec).eval()
    names, shapes = zip(*[(k, tuple(v.shape)) for k, v in tmodel.state_dict().items()])
    sd = golden_state_dict(names, shapes)
    tmodel.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    params, state = convert_state_dict(sd, spec)
    deploy = fold_model(params, state)

    imgs = F._images()
    iou = 0.5
    # adaptive planting: score distributions differ per size (golden m
    # weights peak lower than n); walk the threshold down until every image
    # contributes GT, else the rows are vacuous zeros
    for plant_conf in (0.55, 0.4, 0.25, 0.1, 0.05, 0.01):
        tp_plant = F._torch_detect_pipeline(tmodel, imgs, plant_conf, iou)
        if all(len(p["pred_scores"]) >= 3 for p in tp_plant):
            break
    gts = F._plant_gt(tp_plant)
    eval_conf = plant_conf / 2
    m_ref = F._score_boxes(F._torch_detect_pipeline(tmodel, imgs, eval_conf, iou), gts)
    if m_ref["map50"] < 0.5:
        raise RuntimeError(f"size {size}: planted-GT reference mAP50 {m_ref['map50']:.3f} — protocol breakdown")
    print(json.dumps({"size": size, "plant_conf": plant_conf, "eval_conf": eval_conf,
                      "ref_map50": round(m_ref["map50"], 4)}), flush=True)

    def jmap(predictor):
        return F._score_boxes(F._jax_pipeline(predictor, imgs, eval_conf, iou, "detect"), gts)

    base = YOLO11Model.from_params(deploy, task="detect", size=size, nc=nc,
                                   fused=True, compute_dtype=jnp.float32)
    calib = [im[None] for im in F._images(seed=21)[:2]]

    def ptq(min_channels=None):
        q = PostTrainingQuantizer(base, {"imgsz": imgsz})
        q.set_calibration_data(calib)
        qm = q.optimize()
        if min_channels is not None:
            qm.quant_min_channels = min_channels
        return qm.predictor

    variants = {
        "f32": Predictor(deploy, spec, compute_dtype=jnp.float32, pre_topk=2048),
        "bf16": YOLO11Model.from_params(deploy, task="detect", size=size, nc=nc,
                                        fused=True, compute_dtype=jnp.bfloat16).predictor,
        "int8_static8": ptq(),
        "int8_all_convs": ptq(1),
        "int8_weight_only": ptq(1 << 30),
    }
    sp, _, _, rep = slim_model(deploy, None, spec, keep_frac=0.5)
    variants["slim0.5"] = YOLO11Model.from_params(
        sp, task="detect", size=size, nc=nc, fused=True, compute_dtype=jnp.float32).predictor

    rows = []
    for name, pred in variants.items():
        m_v = jmap(pred)
        rows.append({
            "size": size, "variant": name,
            "map50_delta": round(abs(m_ref["map50"] - m_v["map50"]), 4),
            "map_delta": round(abs(m_ref["map"] - m_v["map"]), 4),
            "map75_delta": round(abs(m_ref["map75"] - m_v["map75"]), 4),
        })
        print(json.dumps(rows[-1]), flush=True)
    return rows


def run_seg_half(imgsz: int = 128):
    """Emit the mask_mode='device_half' accuracy row (pairs the 4x-transfer
    mask-read speed lever, PERF_MATRIX seg_mask_read_half, with accuracy
    evidence). Protocol + gates live in
    tests/test_fidelity_variants.py seg_half_metrics().

    ``--imgsz`` scales the test geometry: the device_half boundary error is
    a fixed <=1 px band, so its share of each mask shrinks linearly with
    resolution — the 128-px gate row overstates the production-640 delta by
    ~5x (the mAP50-95 0.068 at 128 px is scored against the full-grid mask
    itself at the harness's smallest legal size)."""
    import test_fidelity_map as F

    F.IMGSZ = imgsz  # the numpy pipeline reads module-level geometry
    from test_fidelity_variants import seg_half_metrics

    m = seg_half_metrics()
    row = {
        "size": "n", "variant": "seg_device_half_masks", "imgsz": imgsz,
        "mask_iou_vs_full_mean": round(m["iou_mean"], 4),
        "mask_iou_vs_full_min": round(m["iou_min"], 4),
        "mask_map50_delta_vs_full": round(abs(m["mm_full"]["map50"] - m["mm_half"]["map50"]), 4),
        "mask_map_delta_vs_full": round(abs(m["mm_full"]["map"] - m["mm_half"]["map"]), 4),
        "mask_map50_delta_vs_torch": round(abs(m["mm_torch"]["map50"] - m["mm_half"]["map50"]), 4),
        "n_dets": m["n_dets"],
    }
    print(json.dumps(row), flush=True)
    return [row]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sizes", default="n,m")
    ap.add_argument("--imgsz", type=int, default=128)
    ap.add_argument("--seg-half", action="store_true",
                    help="emit only the segment device_half mask accuracy row")
    ap.add_argument("--out", default=None, help="write rows JSON here")
    args = ap.parse_args(argv)
    rows = []
    if args.seg_half:
        rows = run_seg_half(args.imgsz)
        if args.out:
            Path(args.out).write_text(json.dumps({"rows": rows}, indent=1))
        return 0
    for size in args.sizes.split(","):
        rows += run_size(size.strip(), args.imgsz)
    out = {
        "protocol": "planted-GT two-pipeline fidelity (tests/test_fidelity_map.py), "
                    "GT planted at conf 0.55 from the torch pipeline, all pipelines "
                    "evaluated at conf 0.25, AP oracle, synthetic golden weights",
        "rows": rows,
    }
    if args.out:
        Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
