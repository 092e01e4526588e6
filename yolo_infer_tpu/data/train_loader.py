"""Training batch pipeline: augment on host threads, prefetch to the device.

Replaces the torch DataLoader+DDP-sampler machinery the reference inherits
(reference core/robust_trainer.py:364-380: sampler epoch seeding, warmup
dataloader). TPU-native shape: a background thread builds fixed-shape
augmented batches (static (B, S, S, 3) images, labels padded to `max_boxes`
with a validity mask — the padding that lets the loss jit once) while the
device executes the previous step; a bounded queue provides double-buffering.
Host-side batch *sanitation* (dropping malformed labels before dispatch)
is half of the robust-training story (SURVEY.md §5 failure detection).
"""

from __future__ import annotations

import logging
import queue
import random
import threading
from typing import Any, Dict, Generator, Iterator, Optional

import numpy as np

from yolo_infer_tpu.data.augment import DEFAULT_AUG, augment_sample
from yolo_infer_tpu.data.dataset import YOLODataset

logger = logging.getLogger(__name__)


def pad_labels(boxes: np.ndarray, classes: np.ndarray, max_boxes: int):
    """Fixed-shape (max_boxes, ...) label tensors + validity mask."""
    n = min(len(boxes), max_boxes)
    out_boxes = np.zeros((max_boxes, 4), np.float32)
    out_cls = np.zeros((max_boxes,), np.int32)
    mask = np.zeros((max_boxes,), bool)
    if n:
        out_boxes[:n] = boxes[:n]
        out_cls[:n] = classes[:n]
        mask[:n] = True
    return out_boxes, out_cls, mask


# COCO-17 left/right keypoint swap for horizontal flips
COCO_FLIP_IDX = [0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13, 16, 15]


class TrainLoader:
    """Iterates augmented fixed-shape batches with background prefetch.

    task='detect' gets the full mosaic/affine/mixup pipeline; segment/pose use
    letterbox+HSV+flip (geometric label transforms stay exact) and add the
    task targets: 'masks' (B, S/4, S/4) int32 instance-id overlap masks for
    segment, 'kpts' (B, M, K, 3) letterboxed-pixel keypoints for pose.
    """

    def __init__(
        self,
        dataset: YOLODataset,
        batch_size: int = 16,
        imgsz: int = 640,
        max_boxes: int = 120,
        hyp: Optional[Dict[str, float]] = None,
        seed: int = 0,
        prefetch: int = 2,
        workers: int = 1,
        task: str = "detect",
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.imgsz = imgsz
        self.max_boxes = max_boxes
        self.hyp = {**DEFAULT_AUG, **(hyp or {})}
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0
        self.task = task if task != "detect" else getattr(dataset, "task", "detect")
        # mosaic/affine pipeline is detect-only; task labels get exact transforms
        self.mosaic_enabled = self.hyp["mosaic"] > 0 and self.task == "detect"
        self.corrupt_samples = 0  # host-side sanitation counter (robust training)

    def __len__(self) -> int:
        # must match epoch_batches exactly (ragged final chunk is dropped
        # when full batches exist; tiny datasets yield one padded batch)
        return max(len(self.ds) // self.batch_size, 1)

    def close_mosaic(self) -> None:
        """Disable mosaic for the final close_mosaic epochs (capability parity
        with the reference's close-mosaic switchover, robust_trainer.py:371-373)."""
        if self.mosaic_enabled:
            logger.info("closing mosaic augmentation")
        self.mosaic_enabled = False

    def _build_sample(self, rng: random.Random, i: int):
        use_mosaic = self.mosaic_enabled and rng.random() < self.hyp["mosaic"]
        if use_mosaic:
            extra = [rng.randrange(len(self.ds)) for _ in range(3)]
            records = [self._safe_record(j) for j in [i, *extra]]
        else:
            records = [self._safe_record(i)]
        return augment_sample(records, rng, imgsz=self.imgsz, hyp=self.hyp, use_mosaic=use_mosaic)

    def _build_task_sample(self, rng: random.Random, i: int):
        """segment/pose sample: letterbox + HSV + flip with exact label maps."""
        from yolo_infer_tpu.data.augment import hsv_augment
        from yolo_infer_tpu.data.dataset import rasterize_instance_mask
        from yolo_infer_tpu.ops.letterbox import letterbox

        r = self._safe_record(i)
        img, ratio, pad = letterbox(r["image"], self.imgsz)
        boxes = r["boxes"].copy() if len(r["boxes"]) else np.zeros((0, 4), np.float32)
        if len(boxes):
            boxes = boxes * ratio
            boxes[:, [0, 2]] += pad[0]
            boxes[:, [1, 3]] += pad[1]
        extras: Dict[str, np.ndarray] = {}
        if self.task == "obb":
            rb = r.get("rboxes", np.zeros((0, 5), np.float32)).copy()
            if len(rb):
                rb[:, 0] = rb[:, 0] * ratio + pad[0]
                rb[:, 1] = rb[:, 1] * ratio + pad[1]
                rb[:, 2:4] *= ratio
            extras["rboxes"] = rb
        if self.task == "segment":
            extras["mask"] = rasterize_instance_mask(
                r.get("polygons", []), r["orig_shape"], scale=ratio, pad=pad,
                out_hw=(self.imgsz, self.imgsz), downsample=4,
            )
        elif self.task == "pose":
            kp = r.get("keypoints", np.zeros((0, 17, 3), np.float32)).copy()
            if len(kp):
                kp[..., 0] = kp[..., 0] * ratio + pad[0]
                kp[..., 1] = kp[..., 1] * ratio + pad[1]
            extras["kpts"] = kp
        img = hsv_augment(img, rng, self.hyp["hsv_h"], self.hyp["hsv_s"], self.hyp["hsv_v"])
        if rng.random() < self.hyp["fliplr"]:
            img = np.ascontiguousarray(img[:, ::-1])
            if len(boxes):
                boxes[:, [0, 2]] = self.imgsz - boxes[:, [2, 0]]
            if "mask" in extras:
                extras["mask"] = np.ascontiguousarray(extras["mask"][:, ::-1])
            if "kpts" in extras and len(extras["kpts"]):
                kp = extras["kpts"]
                kp[..., 0] = self.imgsz - kp[..., 0]
                if kp.shape[1] == len(COCO_FLIP_IDX):
                    extras["kpts"] = kp[:, COCO_FLIP_IDX]
            if "rboxes" in extras and len(extras["rboxes"]):
                rb = extras["rboxes"]
                rb[:, 0] = self.imgsz - rb[:, 0]
                rb[:, 4] = -rb[:, 4]  # mirror reflection negates the angle
                rb[:, 4] = np.where(rb[:, 4] < -np.pi / 4, rb[:, 4] + np.pi, rb[:, 4])
        return img, boxes.astype(np.float32), r["classes"].astype(np.int32), extras

    def _build_batch(self, rng: random.Random, indices) -> Dict[str, np.ndarray]:
        if self.task in ("segment", "pose", "obb"):
            return self._build_task_batch(rng, indices)
        images, boxes_l, cls_l, mask_l = [], [], [], []
        for i in indices:
            img, boxes, cls = self._build_sample(rng, i)
            if self.hyp.get("mixup", 0.0) > 0 and rng.random() < self.hyp["mixup"]:
                # mixup: beta(32,32) image blend, label union (YOLO convention)
                img2, boxes2, cls2 = self._build_sample(rng, rng.randrange(len(self.ds)))
                lam = np.random.default_rng(rng.randrange(1 << 31)).beta(32.0, 32.0)
                img = (img.astype(np.float32) * lam + img2.astype(np.float32) * (1 - lam)).astype(np.uint8)
                boxes = np.concatenate([boxes, boxes2], axis=0)
                cls = np.concatenate([cls, cls2], axis=0)
            b, c, m = pad_labels(boxes, cls, self.max_boxes)
            images.append(img)
            boxes_l.append(b)
            cls_l.append(c)
            mask_l.append(m)
        return {
            # uint8 to the device; the jitted train step normalizes in-graph
            # (4x less host->device traffic than f32)
            "images": np.stack(images),
            "boxes": np.stack(boxes_l),
            "classes": np.stack(cls_l),
            "mask": np.stack(mask_l),
        }

    def _build_task_batch(self, rng: random.Random, indices) -> Dict[str, np.ndarray]:
        images, boxes_l, cls_l, valid_l, seg_masks, kpts_l = [], [], [], [], [], []
        k = getattr(self.ds, "kpt_shape", (17, 3))[0]
        for i in indices:
            img, boxes, cls, extras = self._build_task_sample(rng, i)
            if self.task == "obb":
                # fixed-shape (max_boxes, 5) rotated boxes replace xyxy
                rb = extras["rboxes"]
                b = np.zeros((self.max_boxes, 5), np.float32)
                c = np.zeros((self.max_boxes,), np.int32)
                m = np.zeros((self.max_boxes,), bool)
                n = min(len(rb), self.max_boxes)
                if n:
                    b[:n] = rb[:n]
                    c[:n] = cls[:n]
                    m[:n] = True
                images.append(img)
                boxes_l.append(b)
                cls_l.append(c)
                valid_l.append(m)
                continue
            b, c, m = pad_labels(boxes, cls, self.max_boxes)
            images.append(img)
            boxes_l.append(b)
            cls_l.append(c)
            valid_l.append(m)
            if self.task == "segment":
                mask = extras["mask"]
                mask = np.where(mask > self.max_boxes, 0, mask)  # truncated instances
                seg_masks.append(mask)
            elif self.task == "pose":
                kp = np.zeros((self.max_boxes, k, 3), np.float32)
                n = min(len(extras["kpts"]), self.max_boxes)
                if n:
                    kp[:n] = extras["kpts"][:n]
                kpts_l.append(kp)
        out = {
            "images": np.stack(images),  # uint8; normalized in the train step
            "boxes": np.stack(boxes_l),
            "classes": np.stack(cls_l),
            "mask": np.stack(valid_l),
        }
        if seg_masks:
            out["masks"] = np.stack(seg_masks).astype(np.int32)
        if kpts_l:
            out["kpts"] = np.stack(kpts_l)
        return out

    def _safe_record(self, i: int) -> Dict[str, np.ndarray]:
        """Batch sanitation: a corrupt image/label never reaches the device —
        it is logged and replaced (host-side half of robust training)."""
        try:
            return self.ds[i]
        except Exception as e:  # noqa: BLE001
            self.corrupt_samples += 1
            logger.warning("skipping corrupt sample %d (%s)", i, e)
            return {
                "image": np.full((self.imgsz, self.imgsz, 3), 114, np.uint8),
                "boxes": np.zeros((0, 4), np.float32),
                "classes": np.zeros((0,), np.int32),
                "orig_shape": (self.imgsz, self.imgsz),
                "path": None,
            }

    def epoch_batches(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        """Prefetching iterator over one epoch (deterministic per (seed, epoch))."""
        rng = random.Random(self.seed + epoch * 9973)
        order = list(range(len(self.ds)))
        rng.shuffle(order)
        chunks = [order[i : i + self.batch_size] for i in range(0, len(order), self.batch_size)]
        # drop ragged final chunk only if there are other chunks (static shapes)
        chunks = [c for c in chunks if len(c) == self.batch_size] or chunks[:1]
        if len(chunks[0]) < self.batch_size:  # tiny dataset: repeat to fill
            chunks[0] = (chunks[0] * self.batch_size)[: self.batch_size]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for chunk in chunks:
                    if stop.is_set():
                        return
                    q.put(self._build_batch(rng, chunk))
            except Exception:  # noqa: BLE001 — sentinel must ALWAYS arrive or training hangs
                logger.exception("train batch producer failed")
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
