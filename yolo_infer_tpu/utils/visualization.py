"""Drawing and export utilities (host-side, OpenCV).

API parity with the reference's utils/visualization.py (draw_detections
:18-106, get_color :109-133, create_video_writer :136-194,
draw_segmentation_mask :197-222, draw_keypoints :225-268,
create_grid_visualization :271-339, save_detection_results :342-437).
Operates on RGB uint8 arrays (this framework's canonical image form).
"""

from __future__ import annotations

import csv
import json
import logging
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

logger = logging.getLogger(__name__)

# 10-color cycle (RGB)
_PALETTE: List[Tuple[int, int, int]] = [
    (255, 56, 56), (255, 157, 151), (255, 112, 31), (255, 178, 29),
    (207, 210, 49), (72, 249, 10), (26, 140, 255), (0, 212, 187),
    (132, 56, 255), (82, 0, 133),
]

# COCO-pose skeleton edges (17-keypoint convention)
POSE_SKELETON = [
    (15, 13), (13, 11), (16, 14), (14, 12), (11, 12), (5, 11), (6, 12),
    (5, 6), (5, 7), (6, 8), (7, 9), (8, 10), (1, 2), (0, 1), (0, 2),
    (1, 3), (2, 4), (3, 5), (4, 6),
]


def get_color(class_id: int) -> Tuple[int, int, int]:
    return _PALETTE[int(class_id) % len(_PALETTE)]


def draw_detections(
    image: np.ndarray,
    boxes: np.ndarray,
    scores: np.ndarray,
    classes: np.ndarray,
    names: Optional[Dict[int, str]] = None,
    line_width: Optional[int] = None,
    font_scale: Optional[float] = None,
    show_labels: bool = True,
    show_conf: bool = True,
) -> np.ndarray:
    """Draw xyxy boxes + class/conf labels. Returns a new image."""
    import cv2

    out = image.copy()
    h, w = out.shape[:2]
    lw = line_width or max(round((h + w) / 2 * 0.003), 2)
    fs = font_scale or lw / 3
    for box, score, cls in zip(boxes, scores, classes):
        c = int(cls)
        color = get_color(c)
        p1 = (int(box[0]), int(box[1]))
        p2 = (int(box[2]), int(box[3]))
        cv2.rectangle(out, p1, p2, color, lw, cv2.LINE_AA)
        if show_labels:
            name = (names or {}).get(c, str(c))
            label = f"{name} {score:.2f}" if show_conf else name
            tw, th = cv2.getTextSize(label, 0, fs, max(lw - 1, 1))[0]
            outside = p1[1] - th >= 3
            p2_label = (p1[0] + tw, p1[1] - th - 3 if outside else p1[1] + th + 3)
            cv2.rectangle(out, p1, p2_label, color, -1, cv2.LINE_AA)
            cv2.putText(
                out, label, (p1[0], p1[1] - 2 if outside else p1[1] + th + 2),
                0, fs, (255, 255, 255), max(lw - 1, 1), cv2.LINE_AA,
            )
    return out


def draw_results(image: np.ndarray, result: Any) -> np.ndarray:
    """Draw a predictor Results object for any task (boxes + masks +
    keypoints + oriented boxes + classification label)."""
    import cv2

    out = image
    if getattr(result, "probs", None) is not None:
        top = int(np.argmax(result.probs))
        name = result.names.get(top, str(top))
        out = out.copy()
        cv2.putText(out, f"{name} {float(result.probs[top]):.2f}", (10, 30),
                    0, 1.0, (255, 255, 255), 2, cv2.LINE_AA)
        return out
    if result.masks is not None and len(result.masks):
        out = draw_segmentation_masks(out, result.masks, result.classes)
    if getattr(result, "obb", None) is not None and len(result.obb):
        return draw_obb(out, result.obb, result.scores, result.classes, result.names)
    out = draw_detections(out, result.boxes, result.scores, result.classes, result.names)
    if result.keypoints is not None and len(result.keypoints):
        out = draw_keypoints(out, result.keypoints)
    return out


def draw_segmentation_masks(
    image: np.ndarray,
    masks: np.ndarray,  # (n, Hm, Wm) float [0,1] in letterbox/proto grid or image grid
    classes: np.ndarray,
    alpha: float = 0.5,
    threshold: float = 0.5,
) -> np.ndarray:
    import cv2

    out = image.copy().astype(np.float32)
    h, w = image.shape[:2]
    for m, c in zip(masks, classes):
        mm = cv2.resize(m.astype(np.float32), (w, h)) > threshold
        color = np.array(get_color(int(c)), np.float32)
        out[mm] = out[mm] * (1 - alpha) + color * alpha
    return out.astype(np.uint8)


def draw_keypoints(
    image: np.ndarray,
    keypoints: np.ndarray,  # (n, K, 3) x,y,conf
    skeleton: Sequence[Tuple[int, int]] = POSE_SKELETON,
    conf_thres: float = 0.5,
    radius: int = 3,
) -> np.ndarray:
    import cv2

    out = image.copy()
    for kpts in keypoints:
        for x, y, c in kpts:
            if c >= conf_thres:
                cv2.circle(out, (int(x), int(y)), radius, (0, 255, 0), -1, cv2.LINE_AA)
        for a, b in skeleton:
            if a < len(kpts) and b < len(kpts) and kpts[a, 2] >= conf_thres and kpts[b, 2] >= conf_thres:
                cv2.line(out, (int(kpts[a, 0]), int(kpts[a, 1])), (int(kpts[b, 0]), int(kpts[b, 1])), (255, 128, 0), 2, cv2.LINE_AA)
    return out


def draw_obb(
    image: np.ndarray,
    boxes_xywhr: np.ndarray,  # (n, 5) cx, cy, w, h, rad
    scores: np.ndarray,
    classes: np.ndarray,
    names: Optional[Dict[int, str]] = None,
) -> np.ndarray:
    import cv2

    out = image.copy()
    for (cx, cy, w, h, r), score, cls in zip(boxes_xywhr, scores, classes):
        pts = cv2.boxPoints(((float(cx), float(cy)), (float(w), float(h)), float(np.degrees(r))))
        cv2.polylines(out, [pts.astype(np.int32)], True, get_color(int(cls)), 2, cv2.LINE_AA)
        name = (names or {}).get(int(cls), str(int(cls)))
        cv2.putText(out, f"{name} {score:.2f}", (int(cx), int(cy)), 0, 0.5, (255, 255, 255), 1, cv2.LINE_AA)
    return out


def create_video_writer(
    path: Union[str, Path],
    fps: float,
    frame_size: Tuple[int, int],  # (w, h)
):
    """VideoWriter with a codec fallback chain (reference visualization.py:136-194)."""
    import cv2

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    for codec in ("avc1", "mp4v", "H264", "X264", "MJPG"):
        writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*codec), fps, frame_size)
        if writer.isOpened():
            logger.debug("video writer using codec %s", codec)
            return writer
        writer.release()
    raise RuntimeError(f"no working codec for {path}")


def create_grid_visualization(
    images: Sequence[np.ndarray],
    cols: int = 3,
    cell_size: Tuple[int, int] = (320, 320),
    pad_value: int = 114,
) -> np.ndarray:
    """Tile images into a grid (reference visualization.py:271-339)."""
    import cv2

    n = len(images)
    if n == 0:
        raise ValueError("no images")
    cols = min(cols, n)
    rows = (n + cols - 1) // cols
    cw, ch = cell_size
    grid = np.full((rows * ch, cols * cw, 3), pad_value, np.uint8)
    for i, img in enumerate(images):
        r, c = divmod(i, cols)
        scale = min(cw / img.shape[1], ch / img.shape[0])
        nw, nh = int(img.shape[1] * scale), int(img.shape[0] * scale)
        resized = cv2.resize(img, (nw, nh))
        y0 = r * ch + (ch - nh) // 2
        x0 = c * cw + (cw - nw) // 2
        grid[y0 : y0 + nh, x0 : x0 + nw] = resized
    return grid


def save_detection_results(
    results: Sequence[Any],
    path: Union[str, Path],
    fmt: str = "json",
) -> None:
    """txt/json/csv result export (reference visualization.py:342-437)."""
    from yolo_infer_tpu.data.loader import save_predictions_to_file

    save_predictions_to_file(results, path, fmt)
