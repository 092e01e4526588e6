"""DetectionDemo — image / video / webcam inference demos.

API parity with the reference DetectionDemo (reference demos/
detection_demo.py: defaults conf=0.5/iou=0.45 :36-37, detect_image :60,
detect_video :138, detect_webcam :242, standalone CLI :314-384), with the
video path redesigned as a streaming batched pipeline: the reference runs a
synchronous per-frame predict loop (detection_demo.py:182-221, batch=1);
here a decode thread feeds fixed-size frame batches, the device pipelines
`pipeline_depth` async batches, and the host draws/encodes while the TPU
computes (SURVEY.md §7 step 8 — this overlap is where the throughput target
is won).
"""

from __future__ import annotations

import collections
import logging
import queue
import threading
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import numpy as np

from yolo_infer_tpu.core.model import YOLO11Factory, YOLO11Model
from yolo_infer_tpu.data.loader import get_video_info, load_image, save_image
from yolo_infer_tpu.ops.letterbox import letterbox_params, scale_boxes
from yolo_infer_tpu.utils.visualization import create_video_writer, draw_detections, draw_results

logger = logging.getLogger(__name__)


class DetectionDemo:
    """Object-detection demo runner over the TPU-native predict pipeline."""

    TASK_SUFFIX = {"detect": "", "segment": "-seg", "classify": "-cls", "pose": "-pose", "obb": "-obb"}

    def __init__(
        self,
        model_size: str = "n",
        model_path: Optional[str] = None,
        device: Optional[str] = None,
        conf_threshold: float = 0.5,
        iou_threshold: float = 0.45,
        imgsz: int = 640,
        task: str = "detect",  # reference main.py demo --task parity
    ):
        if task not in self.TASK_SUFFIX:
            raise ValueError(f"unknown task {task!r}; expected one of {sorted(self.TASK_SUFFIX)}")
        if model_path:
            self.model = YOLO11Model(model_path, device=device)
            self.task = self.model.task
        else:
            self.model = YOLO11Model(f"yolo11{model_size}{self.TASK_SUFFIX[task]}", device=device)
            self.task = task
        self.conf_threshold = conf_threshold
        self.iou_threshold = iou_threshold
        self.imgsz = imgsz

    # ----------------------------------------------------------------- image

    def detect_image(
        self,
        image_path: Union[str, Path, np.ndarray],
        output_path: Optional[Union[str, Path]] = None,
        display: bool = False,
    ) -> Dict[str, Any]:
        """Detect on one image; returns the reference's structured dict
        (detection_demo.py:116-134: num_detections/classes/confidences/boxes)."""
        img = load_image(image_path) if isinstance(image_path, (str, Path)) else image_path
        t0 = time.perf_counter()
        result = self.model.predict(img, conf=self.conf_threshold, iou=self.iou_threshold, imgsz=self.imgsz)[0]
        elapsed = time.perf_counter() - t0
        annotated = draw_results(img, result)
        if output_path:
            save_image(output_path, annotated)
            logger.info("saved annotated image to %s", output_path)
        if display:
            self._imshow("detection", annotated)
        return {
            "num_detections": len(result),
            "classes": [result.names.get(int(c), str(int(c))) for c in result.classes],
            "confidences": result.scores.tolist(),
            "boxes": result.boxes.tolist(),
            "inference_time_s": elapsed,
            "annotated_image": annotated,
        }

    # ----------------------------------------------------------------- video

    def detect_video(
        self,
        video_path: Union[str, Path],
        output_path: Optional[Union[str, Path]] = None,
        display: bool = False,
        batch_size: int = 8,
        pipeline_depth: int = 2,
        max_frames: Optional[int] = None,
        progress_every: int = 30,
    ) -> Dict[str, Any]:
        """Streaming batched video inference with decode/compute/encode overlap."""
        import cv2
        import jax.numpy as jnp

        from yolo_infer_tpu.ops.letterbox import letterbox

        if self.task != "detect":
            # non-detect tasks: per-frame predict + task-aware drawing (the
            # reference's video loop is per-frame for every task as well —
            # reference demos/detection_demo.py:182-221)
            return self._video_per_frame(video_path, output_path, display, max_frames)

        info = get_video_info(video_path)
        writer = create_video_writer(output_path, info["fps"] or 30.0, (info["width"], info["height"])) if output_path else None

        batch_q: "queue.Queue" = queue.Queue(maxsize=pipeline_depth + 1)
        stop = threading.Event()

        # the producer thread decodes, letterboxes AND uploads whole batches:
        # host->device transfer (the binding resource on remote links) overlaps
        # both device compute and the main thread's draw/encode work
        def producer():
            cap = cv2.VideoCapture(str(video_path))
            n = 0
            frames: List[np.ndarray] = []
            lbs: List[np.ndarray] = []

            def flush():
                if not frames:
                    return
                padded = lbs + [lbs[-1]] * (batch_size - len(lbs))
                dev = jnp.asarray(np.stack(padded))  # async upload starts here
                batch_q.put((list(frames), dev))
                frames.clear()
                lbs.clear()

            try:
                while not stop.is_set():
                    ok, frame = cap.read()
                    if not ok or (max_frames and n >= max_frames):
                        break
                    rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                    lb, _, _ = letterbox(rgb, self.imgsz)
                    frames.append(rgb)
                    lbs.append(lb)
                    n += 1
                    if len(frames) == batch_size:
                        flush()
                flush()
            finally:
                cap.release()
                batch_q.put(None)

        threading.Thread(target=producer, daemon=True).start()

        predictor = self.model.predictor
        ratio, pad, _ = letterbox_params((info["height"], info["width"]), self.imgsz)
        pending: "collections.deque" = collections.deque()
        total_frames = 0
        total_dets = 0
        t_start = time.perf_counter()
        eof = False

        def drain_one():
            nonlocal total_dets
            dets, frames = pending.popleft()
            # sync point — leave the big packed mask buffer on device: this
            # drain draws boxes only, and fetching (B, max_det, imgsz,
            # imgsz/8) per batch would serialize the pipeline on transfers
            dets = {k: np.asarray(v) for k, v in dets.items() if v is not None and k != "mask_bits_up"}
            for i, frame in enumerate(frames):
                k = int(dets["num"][i])
                boxes = scale_boxes(dets["boxes"][i, :k], ratio, pad, frame.shape[:2])
                total_dets += k
                annotated = draw_detections(
                    frame, boxes, dets["scores"][i, :k], dets["classes"][i, :k].astype(np.int32),
                    self.model.names,
                )
                if writer is not None:
                    writer.write(cv2.cvtColor(annotated, cv2.COLOR_RGB2BGR))
                if display:
                    self._imshow("video", annotated, wait=1)

        try:
            while True:
                item = batch_q.get()
                if item is None:
                    break
                frames, dev_batch = item
                dets = predictor.predict_raw(dev_batch, self.conf_threshold, self.iou_threshold, self.imgsz)
                pending.append((dets, frames))  # async: device runs while host draws
                total_frames += len(frames)
                if len(pending) > pipeline_depth:
                    drain_one()
                if progress_every and total_frames % (progress_every * batch_size) < batch_size:
                    logger.info("processed %d frames", total_frames)
            while pending:
                drain_one()
        finally:
            stop.set()
            if writer is not None:
                writer.release()

        elapsed = time.perf_counter() - t_start
        summary = {
            "total_frames": total_frames,
            "total_detections": total_dets,
            "processing_time_s": elapsed,
            "fps": total_frames / elapsed if elapsed > 0 else 0.0,
            "video_info": info,
            "output_path": str(output_path) if output_path else None,
        }
        logger.info("video done: %d frames in %.1fs (%.1f fps)", total_frames, elapsed, summary["fps"])
        return summary

    def _video_per_frame(self, video_path, output_path, display, max_frames) -> Dict[str, Any]:
        import cv2

        info = get_video_info(video_path)
        writer = create_video_writer(output_path, info["fps"] or 30.0, (info["width"], info["height"])) if output_path else None
        cap = cv2.VideoCapture(str(video_path))
        n, total_dets = 0, 0
        t0 = time.perf_counter()
        try:
            while True:
                ok, frame = cap.read()
                if not ok or (max_frames and n >= max_frames):
                    break
                rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                result = self.model.predict(rgb, conf=self.conf_threshold, iou=self.iou_threshold, imgsz=self.imgsz)[0]
                annotated = draw_results(rgb, result)
                total_dets += len(result)
                n += 1
                if writer is not None:
                    writer.write(cv2.cvtColor(annotated, cv2.COLOR_RGB2BGR))
                if display:
                    self._imshow("video", annotated, wait=1)
        finally:
            cap.release()
            if writer is not None:
                writer.release()
        elapsed = time.perf_counter() - t0
        return {
            "total_frames": n,
            "total_detections": total_dets,
            "processing_time_s": elapsed,
            "fps": n / elapsed if elapsed > 0 else 0.0,
            "video_info": info,
            "output_path": str(output_path) if output_path else None,
        }

    # ---------------------------------------------------------------- webcam

    def detect_webcam(self, camera_id: int = 0, display: bool = True, max_frames: Optional[int] = None) -> Dict[str, Any]:
        """Live webcam loop (batch=1, latency-oriented; q to quit)."""
        import cv2

        cap = cv2.VideoCapture(camera_id)
        if not cap.isOpened():
            raise RuntimeError(f"cannot open camera {camera_id}")
        n, t0 = 0, time.perf_counter()
        try:
            while True:
                ok, frame = cap.read()
                if not ok or (max_frames and n >= max_frames):
                    break
                rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                result = self.model.predict(rgb, conf=self.conf_threshold, iou=self.iou_threshold, imgsz=self.imgsz)[0]
                annotated = draw_results(rgb, result)
                n += 1
                if display:
                    cv2.imshow("webcam", cv2.cvtColor(annotated, cv2.COLOR_RGB2BGR))
                    if cv2.waitKey(1) & 0xFF == ord("q"):
                        break
        finally:
            cap.release()
            if display:
                cv2.destroyAllWindows()
        elapsed = time.perf_counter() - t0
        return {"frames": n, "fps": n / elapsed if elapsed > 0 else 0.0}

    @staticmethod
    def _imshow(title: str, img_rgb: np.ndarray, wait: int = 0) -> None:
        import cv2

        try:
            cv2.imshow(title, cv2.cvtColor(img_rgb, cv2.COLOR_RGB2BGR))
            cv2.waitKey(wait)
        except cv2.error:  # headless environment
            logger.warning("display unavailable (headless); skipping imshow")


def main(argv: Optional[List[str]] = None) -> int:
    """Standalone CLI (reference detection_demo.py:314-384)."""
    import argparse

    p = argparse.ArgumentParser(description="YOLO11 TPU detection demo")
    p.add_argument("--input", required=True, help="image/video path or camera index")
    p.add_argument("--output", default=None)
    p.add_argument("--model-size", default="n", choices=list("nsmlx"))
    p.add_argument("--model-path", default=None)
    p.add_argument("--task", default="detect", choices=["detect", "segment", "classify", "pose", "obb"])
    p.add_argument("--conf", type=float, default=0.5)
    p.add_argument("--iou", type=float, default=0.45)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=8, help="video batch size")
    p.add_argument("--display", action="store_true")
    args = p.parse_args(argv)

    demo = DetectionDemo(args.model_size, args.model_path, conf_threshold=args.conf, iou_threshold=args.iou, imgsz=args.imgsz, task=args.task)
    src = args.input
    if src.isdigit():
        out = demo.detect_webcam(int(src), display=args.display)
    elif Path(src).suffix.lower() in {".mp4", ".avi", ".mov", ".mkv", ".webm"}:
        out = demo.detect_video(src, args.output, display=args.display, batch_size=args.batch)
    else:
        out = demo.detect_image(src, args.output, display=args.display)
        out.pop("annotated_image", None)
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
