"""YOLO-format detection dataset (images/ + labels/*.txt with normalized xywh).

The reference hands dataset YAMLs straight to ultralytics (reference
core/trainer.py:173-187, core/validator.py:121-136); here the format is
parsed natively: dataset config YAML {path, train, val, names}, per-image
label files `cls cx cy w h` in [0,1]. Host-side IO only — device work
(letterbox resize, normalize) happens in the jitted pipeline.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, Generator, List, Optional, Sequence, Tuple, Union

import numpy as np

from yolo_infer_tpu.data.loader import IMAGE_EXTS, load_image
from yolo_infer_tpu.ops.letterbox import letterbox, letterbox_params

logger = logging.getLogger(__name__)


def parse_dataset_config(data: Union[str, Path, Dict[str, Any]]) -> Dict[str, Any]:
    if isinstance(data, (str, Path)):
        import yaml

        cfg = yaml.safe_load(Path(data).read_text())
        cfg["_base"] = Path(data).parent
    else:
        cfg = dict(data)
        cfg.setdefault("_base", Path("."))
    names = cfg.get("names", {})
    if isinstance(names, list):
        names = {i: n for i, n in enumerate(names)}
    cfg["names"] = {int(k): str(v) for k, v in names.items()}
    cfg["nc"] = cfg.get("nc", len(cfg["names"]) or 80)
    return cfg


def _resolve_split_dir(cfg: Dict[str, Any], split: str) -> Path:
    base = Path(cfg.get("path", cfg["_base"]))
    if not base.is_absolute():
        base = Path(cfg["_base"]) / base
    p = Path(cfg.get(split, split))
    return p if p.is_absolute() else base / p


def label_path_for(image_path: Path) -> Path:
    """images/.../x.jpg -> labels/.../x.txt (YOLO layout convention)."""
    parts = list(image_path.parts)
    for i in range(len(parts) - 1, -1, -1):
        if parts[i] == "images":
            parts[i] = "labels"
            break
    return Path(*parts).with_suffix(".txt")


def load_labels(label_path: Path, nc: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (classes (M,), xywhn (M,4)); empty arrays if no label file."""
    if not label_path.exists():
        return np.zeros((0,), np.int32), np.zeros((0, 4), np.float32)
    cls_list, box_list = [], []
    for line in label_path.read_text().splitlines():
        parts = line.split()
        if len(parts) < 5:
            continue
        c = int(float(parts[0]))
        if nc is not None and not (0 <= c < nc):
            continue
        box = [float(v) for v in parts[1:5]]
        if not all(0.0 <= v <= 1.0 for v in box):
            continue
        cls_list.append(c)
        box_list.append(box)
    if not cls_list:
        return np.zeros((0,), np.int32), np.zeros((0, 4), np.float32)
    return np.asarray(cls_list, np.int32), np.asarray(box_list, np.float32)


def xywhn_to_xyxy(xywhn: np.ndarray, w: int, h: int) -> np.ndarray:
    """Normalized center-format -> absolute xyxy pixels."""
    out = np.empty_like(xywhn)
    cx, cy = xywhn[:, 0] * w, xywhn[:, 1] * h
    bw, bh = xywhn[:, 2] * w, xywhn[:, 3] * h
    out[:, 0] = cx - bw / 2
    out[:, 1] = cy - bh / 2
    out[:, 2] = cx + bw / 2
    out[:, 3] = cy + bh / 2
    return out


class YOLODataset:
    """Image+label pairs for one split of a YOLO-format dataset."""

    def __init__(self, data: Union[str, Path, Dict[str, Any]], split: str = "val"):
        self.cfg = parse_dataset_config(data)
        self.names = self.cfg["names"]
        self.nc = self.cfg["nc"]
        img_dir = _resolve_split_dir(self.cfg, split)
        if not img_dir.exists():
            raise FileNotFoundError(f"dataset split dir not found: {img_dir}")
        self.images: List[Path] = sorted(
            p for p in img_dir.rglob("*") if p.suffix.lower() in IMAGE_EXTS
        )
        if not self.images:
            raise ValueError(f"no images under {img_dir}")

    def __len__(self) -> int:
        return len(self.images)

    def __getitem__(self, i: int) -> Dict[str, Any]:
        path = self.images[i]
        img = load_image(path)
        h, w = img.shape[:2]
        cls, xywhn = load_labels(label_path_for(path), self.nc)
        return {
            "image": img,
            "path": path,
            "orig_shape": (h, w),
            "classes": cls,
            "boxes": xywhn_to_xyxy(xywhn, w, h) if len(cls) else np.zeros((0, 4), np.float32),
        }

    def iter_val_batches(
        self, batch_size: int = 16, imgsz: int = 640
    ) -> Generator[Dict[str, Any], None, None]:
        """Host-letterboxed uint8 batches + per-image geometry for un-mapping.

        Every image is letterboxed to (imgsz, imgsz) on host (sizes vary per
        image so the resize can't be a single static device op), producing a
        uniform uint8 batch the jitted pipeline consumes without recompiles.
        """
        for start in range(0, len(self), batch_size):
            records = [self[i] for i in range(start, min(start + batch_size, len(self)))]
            imgs, metas = [], []
            for r in records:
                lb, ratio, pad = letterbox(r["image"], imgsz)
                imgs.append(lb)
                metas.append({"ratio": ratio, "pad": pad, **{k: r[k] for k in ("path", "orig_shape", "classes", "boxes")}})
            n = len(imgs)
            if n < batch_size:  # pad batch to static shape
                imgs.extend([np.zeros_like(imgs[0])] * (batch_size - n))
            yield {"images": np.stack(imgs), "metas": metas, "n": n}
