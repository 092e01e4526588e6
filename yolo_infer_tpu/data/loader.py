"""Host-side image/video IO and batching.

API parity with the reference's utils/data_loader.py (load_image :19-60,
load_video/get_video_info :63-124, load_image_batch :127-157, DataLoader
:181-278, save_predictions_to_file :377-411, create_dataset_config :414-444).
Images are returned RGB uint8 HWC — the device pipeline (ops.preprocess) owns
letterbox/normalize, so this layer stays pure IO. OpenCV is host-side codec
work only (SURVEY.md §2b keeps cv2 for IO).
"""

from __future__ import annotations

import csv
import json
import logging
import random
from pathlib import Path
from typing import Any, Dict, Generator, Iterator, List, Optional, Sequence, Tuple, Union

import numpy as np

logger = logging.getLogger(__name__)

IMAGE_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff", ".webp"}
VIDEO_EXTS = {".mp4", ".avi", ".mov", ".mkv", ".webm", ".m4v"}


def load_image(path: Union[str, Path], rgb: bool = True) -> np.ndarray:
    """Read an image file -> uint8 HWC (RGB by default)."""
    import cv2

    img = cv2.imread(str(path), cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(f"could not read image: {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB) if rgb else img


def save_image(path: Union[str, Path], img_rgb: np.ndarray) -> None:
    import cv2

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(path), cv2.cvtColor(img_rgb, cv2.COLOR_RGB2BGR))


def get_video_info(path: Union[str, Path]) -> Dict[str, Any]:
    import cv2

    cap = cv2.VideoCapture(str(path))
    if not cap.isOpened():
        raise FileNotFoundError(f"could not open video: {path}")
    info = {
        "width": int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
        "height": int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
        "fps": cap.get(cv2.CAP_PROP_FPS),
        "frame_count": int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
    }
    info["duration_s"] = info["frame_count"] / info["fps"] if info["fps"] else 0.0
    cap.release()
    return info


def load_video(path: Union[str, Path], rgb: bool = True, max_frames: Optional[int] = None) -> Generator[np.ndarray, None, None]:
    """Yield video frames as uint8 HWC arrays."""
    import cv2

    cap = cv2.VideoCapture(str(path))
    if not cap.isOpened():
        raise FileNotFoundError(f"could not open video: {path}")
    n = 0
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB) if rgb else frame
            n += 1
            if max_frames is not None and n >= max_frames:
                break
    finally:
        cap.release()


def load_image_batch(paths: Sequence[Union[str, Path]], rgb: bool = True) -> List[np.ndarray]:
    return [load_image(p, rgb) for p in paths]


def list_image_files(source: Union[str, Path]) -> List[Path]:
    p = Path(source)
    if p.is_dir():
        return sorted(q for q in p.rglob("*") if q.suffix.lower() in IMAGE_EXTS)
    if p.is_file() and p.suffix.lower() in IMAGE_EXTS:
        return [p]
    raise FileNotFoundError(f"no images at {source}")


class DataLoader:
    """Iterate images from a file, directory, or explicit list in batches.

    Mirrors the reference DataLoader (utils/data_loader.py:181-278):
    batch_size, shuffle, reset; yields (paths, images) per batch.
    """

    def __init__(
        self,
        source: Union[str, Path, Sequence[Union[str, Path]]],
        batch_size: int = 1,
        shuffle: bool = False,
        rgb: bool = True,
        seed: Optional[int] = None,
    ):
        if isinstance(source, (str, Path)):
            self.files = list_image_files(source)
        else:
            self.files = [Path(f) for f in source]
        if not self.files:
            raise ValueError("DataLoader: empty source")
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rgb = rgb
        self._rng = random.Random(seed)
        self._order: List[int] = []
        self.reset()

    def __len__(self) -> int:
        return (len(self.files) + self.batch_size - 1) // self.batch_size

    def reset(self) -> None:
        self._order = list(range(len(self.files)))
        if self.shuffle:
            self._rng.shuffle(self._order)
        self._pos = 0

    def __iter__(self) -> Iterator[Tuple[List[Path], List[np.ndarray]]]:
        self.reset()
        return self

    def __next__(self) -> Tuple[List[Path], List[np.ndarray]]:
        if self._pos >= len(self._order):
            raise StopIteration
        idxs = self._order[self._pos : self._pos + self.batch_size]
        self._pos += len(idxs)
        paths = [self.files[i] for i in idxs]
        return paths, [load_image(p, self.rgb) for p in paths]


def save_predictions_to_file(results: Sequence[Any], path: Union[str, Path], fmt: str = "json") -> None:
    """Persist Results to json/csv/txt (reference utils/data_loader.py:377-411)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    rows = []
    for i, r in enumerate(results):
        for b, s, c in zip(r.boxes, r.scores, r.classes):
            rows.append(
                {
                    "image": i,
                    "class": int(c),
                    "name": r.names.get(int(c), str(int(c))),
                    "confidence": float(s),
                    "x1": float(b[0]),
                    "y1": float(b[1]),
                    "x2": float(b[2]),
                    "y2": float(b[3]),
                }
            )
    if fmt == "json":
        path.write_text(json.dumps(rows, indent=2))
    elif fmt == "csv":
        with path.open("w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=["image", "class", "name", "confidence", "x1", "y1", "x2", "y2"])
            writer.writeheader()
            writer.writerows(rows)
    elif fmt == "txt":
        with path.open("w") as f:
            for row in rows:
                f.write(f"{row['image']} {row['class']} {row['confidence']:.4f} {row['x1']:.1f} {row['y1']:.1f} {row['x2']:.1f} {row['y2']:.1f}\n")
    else:
        raise ValueError(f"unknown format {fmt}")


def create_dataset_config(
    path: Union[str, Path],
    train: str,
    val: str,
    names: Union[Dict[int, str], List[str]],
    test: Optional[str] = None,
) -> Path:
    """Write a YOLO-style dataset YAML (reference utils/data_loader.py:414-444)."""
    import yaml

    if isinstance(names, list):
        names = {i: n for i, n in enumerate(names)}
    cfg: Dict[str, Any] = {"train": train, "val": val, "names": names, "nc": len(names)}
    if test:
        cfg["test"] = test
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(yaml.safe_dump(cfg, sort_keys=False))
    return path
