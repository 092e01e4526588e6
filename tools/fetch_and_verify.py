#!/usr/bin/env python
"""Official-checkpoint fidelity harness: fetch -> convert -> val BOTH stacks.

The reference's accuracy story is "load real ultralytics weights and val"
(reference core/model.py:100-113, core/validator.py:86-136); BASELINE.md's
gate is COCO mAP within 0.1. The in-repo fidelity evidence
(tests/test_fidelity_map.py, two-pipeline delta 0.0000) runs on synthetic
golden weights because this image has zero egress. THIS tool is the
one-command closure for any host WITH network:

  1. download the official checkpoint (ultralytics assets release) and
     coco128 (the standard 128-image COCO slice);
  2. convert the .pt through models/convert (sandboxed unpickler, no
     ultralytics dependency);
  3. validate with the production JAX stack (core/validator — device
     preprocess/forward/decode/NMS, native mAP engine);
  4. validate the SAME images through the independent torch pipeline
     (tests/torch_ref.py forward + numpy decode/NMS), scored by the SAME
     native mAP engine;
  5. print both mAP dicts and the delta vs the 0.1 gate.

Offline (no route to the download hosts) it prints a one-line
{"status": "skipped_offline"} and exits 0 — the CI marker in
tests/test_fetch_verify.py keys off the same probe.

Run (CPU ok, TPU better):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/fetch_and_verify.py \
      --model yolo11n --limit 32
"""

from __future__ import annotations

import argparse
import json
import socket
import sys
import urllib.request
import zipfile
from pathlib import Path

import numpy as np

WEIGHT_URL = "https://github.com/ultralytics/assets/releases/download/v8.3.0/{name}.pt"
COCO128_URLS = (
    "https://ultralytics.com/assets/coco128.zip",
    "https://github.com/ultralytics/assets/releases/download/v0.0.0/coco128.zip",
)
GATE = 0.1  # BASELINE.md: "COCO mAP within 0.1 of reference"


def online(timeout: float = 5.0) -> bool:
    for host in ("github.com", "ultralytics.com"):
        try:
            socket.create_connection((host, 443), timeout=timeout).close()
            return True
        except OSError:
            continue
    return False


def fetch(url: str, dst: Path) -> Path:
    dst.parent.mkdir(parents=True, exist_ok=True)
    if not dst.exists():
        print(f"downloading {url} -> {dst}", file=sys.stderr)
        tmp = dst.with_suffix(dst.suffix + ".part")
        urllib.request.urlretrieve(url, tmp)  # noqa: S310 - fixed https hosts
        tmp.rename(dst)
    return dst


def ensure_coco128(cache: Path) -> Path:
    """Download+extract coco128; returns the data yaml path."""
    root = cache / "coco128"
    if not (root / "images").exists():
        last = None
        for url in COCO128_URLS:
            try:
                z = fetch(url, cache / "coco128.zip")
                with zipfile.ZipFile(z) as zf:
                    zf.extractall(cache)
                break
            except Exception as e:  # noqa: BLE001
                last = e
        else:
            raise RuntimeError(f"could not fetch coco128: {last}")
    yaml_path = root / "coco128.yaml"
    if not yaml_path.exists():
        # coco128 train2017 doubles as val (the upstream convention)
        import yaml as _yaml

        from yolo_infer_tpu.utils.coco_names import COCO_NAMES

        yaml_path.write_text(_yaml.safe_dump({
            "path": str(root),
            "train": "images/train2017",
            "val": "images/train2017",
            "nc": 80,
            "names": {int(k): v for k, v in COCO_NAMES.items()},
        }))
    return yaml_path


# ------------------------------------------------------------------ torch val


def _np_greedy_nms_multilabel(boxes, scores, conf, iou_thres, pre_topk=4096, max_det=300):
    """Vectorized-host greedy class-aware multi-label NMS (val protocol:
    conf=0.001/iou=0.6/pre_topk=4096 — mirrors ops/nms.py's candidate cap)."""
    a, nc = scores.shape
    flat = scores.reshape(-1)
    cand = np.nonzero(flat > conf)[0]
    if len(cand) > pre_topk:
        cand = cand[np.argpartition(-flat[cand], pre_topk - 1)[:pre_topk]]
    order = cand[np.argsort(-flat[cand], kind="stable")]
    ai, ci = order // nc, order % nc
    bx = boxes[ai] + ci[:, None].astype(np.float32) * 7680.0  # class offset
    x1, y1, x2, y2 = bx[:, 0], bx[:, 1], bx[:, 2], bx[:, 3]
    areas = np.maximum(0, x2 - x1) * np.maximum(0, y2 - y1)
    keep = []
    alive = np.ones(len(order), bool)
    for i in range(len(order)):
        if not alive[i]:
            continue
        keep.append(i)
        if len(keep) >= max_det:
            break
        ix1 = np.maximum(x1[i], x1[i + 1:])
        iy1 = np.maximum(y1[i], y1[i + 1:])
        ix2 = np.minimum(x2[i], x2[i + 1:])
        iy2 = np.minimum(y2[i], y2[i + 1:])
        inter = np.maximum(0, ix2 - ix1) * np.maximum(0, iy2 - iy1)
        iou = inter / (areas[i] + areas[i + 1:] - inter + 1e-7)
        alive[i + 1:] &= iou <= iou_thres
    keep = np.array(keep, np.int64)
    return ai[keep], ci[keep], flat[order[keep]]


def torch_ref_val(sd_raw, spec, ds, imgsz, conf, iou_thres, limit):
    """Independent pipeline: torch_ref forward + numpy decode/NMS, scored by
    the native mAP engine. Returns the metrics dict."""
    import torch

    from tests.torch_ref import TorchYOLO11

    from yolo_infer_tpu.core.metrics import DetMetrics
    from yolo_infer_tpu.ops.letterbox import letterbox, scale_boxes

    tmodel = TorchYOLO11(spec).eval()
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd_raw.items()}, strict=False
    )
    real = [k for k in missing if "num_batches_tracked" not in k]
    if real or unexpected:
        print(f"torch_ref load: missing={real[:5]} unexpected={list(unexpected)[:5]}", file=sys.stderr)

    reg_max, nc = spec.reg_max, spec.nc
    metrics = DetMetrics(nc=nc)
    for i in range(min(len(ds), limit)):
        rec = ds[i]
        img, (h, w) = rec["image"], rec["orig_shape"]
        lb, ratio, pad = letterbox(img, imgsz)
        x = torch.from_numpy((lb.astype(np.float32) / 255.0).transpose(2, 0, 1)[None])
        with torch.no_grad():
            res = tmodel(x)
        feats = [f.numpy() for f in (res[0] if isinstance(res, tuple) else res)]
        boxes_l, scores_l = [], []
        for f, s in zip(feats, spec.strides):
            a = f[0].transpose(1, 2, 0)
            fh, fw, _ = a.shape
            flat = a.reshape(fh * fw, -1).astype(np.float64)
            logits = flat[:, : 4 * reg_max].reshape(-1, 4, reg_max)
            e = np.exp(logits - logits.max(-1, keepdims=True))
            dist = (e / e.sum(-1, keepdims=True)) @ np.arange(reg_max, dtype=np.float64)
            gx, gy = np.meshgrid(np.arange(fw) + 0.5, np.arange(fh) + 0.5)
            ap = np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
            boxes_l.append(np.concatenate([ap - dist[:, :2], ap + dist[:, 2:]], axis=-1) * s)
            scores_l.append(1.0 / (1.0 + np.exp(-flat[:, 4 * reg_max:])))
        boxes = np.concatenate(boxes_l).astype(np.float32)
        scores = np.concatenate(scores_l).astype(np.float32)
        ai, ci, sc = _np_greedy_nms_multilabel(boxes, scores, conf, iou_thres)
        pb = scale_boxes(boxes[ai], ratio, pad, (h, w))
        metrics.update(pb, sc.astype(np.float32), ci.astype(np.int32), rec["boxes"], rec["classes"])
    return metrics.compute()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", default="yolo11n")
    ap.add_argument("--data", default=None, help="existing data yaml (skips the coco128 download)")
    ap.add_argument("--weights", default=None, help="existing .pt (skips the weight download)")
    ap.add_argument("--limit", type=int, default=32, help="val image cap (torch side is 1 img/s-ish on CPU)")
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--conf", type=float, default=0.001)
    ap.add_argument("--iou", type=float, default=0.6)
    ap.add_argument("--cache", default=str(Path.home() / ".cache" / "yolo_infer_tpu"))
    args = ap.parse_args(argv)

    cache = Path(args.cache)
    need_net = args.weights is None or args.data is None
    if need_net and not online():
        print(json.dumps({"status": "skipped_offline",
                          "note": "no route to github.com/ultralytics.com; pass --weights/--data for local files"}))
        return 0

    pt = Path(args.weights) if args.weights else fetch(WEIGHT_URL.format(name=args.model), cache / f"{args.model}.pt")
    data = Path(args.data) if args.data else ensure_coco128(cache)

    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.core.validator import YOLO11Validator
    from yolo_infer_tpu.data.dataset import YOLODataset
    from yolo_infer_tpu.models.convert import extract_state_dict, permissive_torch_load

    model = YOLO11Model(pt)  # .pt auto-convert (models/convert.py)
    ds = YOLODataset(str(data), split="val")
    limit = min(args.limit, len(ds))
    ds.images = ds.images[:limit]

    # production JAX stack over the same capped subset
    jax_out = YOLO11Validator(model=model).validate(
        data=str(data), imgsz=args.imgsz, conf=args.conf, iou=args.iou,
        verbose=False, limit=limit,
    )
    # validator reports ultralytics-style keys; normalize to the engine's
    jax_map = {"map": jax_out["metrics"]["mAP50-95"], "map50": jax_out["metrics"]["mAP50"],
               "map75": jax_out["metrics"]["mAP75"]}

    # independent torch pipeline over the SAME raw state dict + images
    obj = permissive_torch_load(pt)
    model_obj = (obj.get("ema") or obj.get("model")) if isinstance(obj, dict) else obj
    sd_raw = extract_state_dict(model_obj)
    if not any(k.startswith("model.") for k in sd_raw):
        sd_raw = {f"model.{k}": v for k, v in sd_raw.items()}
    torch_map = torch_ref_val(sd_raw, model.spec, ds, args.imgsz, args.conf, args.iou, limit)

    deltas = {k: abs(jax_map[k] - torch_map[k]) for k in ("map", "map50", "map75") if k in jax_map and k in torch_map}
    verdict = all(d <= GATE for d in deltas.values())
    print(json.dumps({
        "status": "ok",
        "model": str(pt),
        "images": limit,
        "jax_map": {k: round(float(jax_map[k]), 4) for k in ("map", "map50", "map75") if k in jax_map},
        "torch_map": {k: round(float(torch_map[k]), 4) for k in ("map", "map50", "map75") if k in torch_map},
        "delta": {k: round(float(d), 4) for k, d in deltas.items()},
        "gate": GATE,
        "within_gate": verdict,
    }, indent=2))
    return 0 if verdict else 1


if __name__ == "__main__":
    sys.exit(main())
