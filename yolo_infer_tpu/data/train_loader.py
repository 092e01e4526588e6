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

from yolo_infer_tpu.data.augment import COCO_FLIP_IDX, DEFAULT_AUG, augment_full, concat_labels
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


class TrainLoader:
    """Iterates augmented fixed-shape batches with background prefetch.

    EVERY task gets the full mosaic/affine/mixup/HSV/flip pipeline (parity
    with the reference's per-task augmentation block, reference
    core/trainer.py:609-637) — label geometry transforms exactly
    (data.augment). Task targets: 'masks' (B, S/4, S/4) int32 instance-id
    overlap masks for segment (rasterized from the AUGMENTED polygons),
    'kpts' (B, M, K, 3) canvas-pixel keypoints for pose, 5-column rotated
    'boxes' for obb.
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
        shard: tuple = (0, 1),  # (process_index, process_count): multi-host
        # data sharding — each process iterates a disjoint slice of the
        # epoch's batches (the per-rank sampler of the reference,
        # robust_trainer.py:367-368)
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.imgsz = imgsz
        self.max_boxes = max_boxes
        self.hyp = {**DEFAULT_AUG, **(hyp or {})}
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0
        self.shard = shard
        self.task = task if task != "detect" else getattr(dataset, "task", "detect")
        self.mosaic_enabled = self.hyp["mosaic"] > 0
        self.corrupt_samples = 0  # host-side sanitation counter (robust training)

    def __len__(self) -> int:
        # must match epoch_batches exactly (ragged final chunk is dropped
        # when full batches exist; tiny datasets yield one padded batch)
        n = max(len(self.ds) // self.batch_size, 1)
        rank, world = self.shard
        if world > 1 and n >= world:
            n = n // world  # equal per-process step counts (ragged dropped)
        return n

    def close_mosaic(self) -> None:
        """Disable mosaic for the final close_mosaic epochs (capability parity
        with the reference's close-mosaic switchover, robust_trainer.py:371-373)."""
        if self.mosaic_enabled:
            logger.info("closing mosaic augmentation")
        self.mosaic_enabled = False

    def _build_sample(self, rng: random.Random, i: int):
        """One augmented (image, labels) for ANY task (mosaic/affine/mixup)."""
        use_mosaic = self.mosaic_enabled and rng.random() < self.hyp["mosaic"]
        if use_mosaic:
            extra = [rng.randrange(len(self.ds)) for _ in range(3)]
            records = [self._safe_record(j) for j in [i, *extra]]
        else:
            records = [self._safe_record(i)]
        img, lab = augment_full(
            records, rng, imgsz=self.imgsz, hyp=self.hyp, use_mosaic=use_mosaic, task=self.task
        )
        if self.hyp.get("mixup", 0.0) > 0 and rng.random() < self.hyp["mixup"]:
            # mixup: beta(32,32) image blend, label union (YOLO convention)
            img2, lab2 = self._build_sample(rng, rng.randrange(len(self.ds)))
            lam = np.random.default_rng(rng.randrange(1 << 31)).beta(32.0, 32.0)
            img = (img.astype(np.float32) * lam + img2.astype(np.float32) * (1 - lam)).astype(np.uint8)
            lab = concat_labels([lab, lab2])
        return img, lab

    def _build_batch(self, rng: random.Random, indices) -> Dict[str, np.ndarray]:
        from yolo_infer_tpu.data.dataset import rasterize_instance_mask

        images, boxes_l, cls_l, valid_l, seg_masks, kpts_l = [], [], [], [], [], []
        k = getattr(self.ds, "kpt_shape", (17, 3))[0]
        size = np.array([self.imgsz, self.imgsz], np.float32)
        for i in indices:
            img, lab = self._build_sample(rng, i)
            images.append(img)
            if self.task == "obb":
                # fixed-shape (max_boxes, 5) rotated boxes replace xyxy
                rb = lab["rboxes"]
                b = np.zeros((self.max_boxes, 5), np.float32)
                c = np.zeros((self.max_boxes,), np.int32)
                m = np.zeros((self.max_boxes,), bool)
                n = min(len(rb), self.max_boxes)
                if n:
                    b[:n] = rb[:n]
                    c[:n] = lab["classes"][:n]
                    m[:n] = True
                boxes_l.append(b)
                cls_l.append(c)
                valid_l.append(m)
                continue
            b, c, m = pad_labels(lab["boxes"], lab["classes"], self.max_boxes)
            boxes_l.append(b)
            cls_l.append(c)
            valid_l.append(m)
            if self.task == "segment":
                # rasterize the AUGMENTED polygons on the final canvas; mask
                # id i+1 corresponds to padded label row i
                polys_n = [p / size for p in lab["polygons"]]
                mask = rasterize_instance_mask(
                    polys_n, (self.imgsz, self.imgsz), out_hw=(self.imgsz, self.imgsz), downsample=4
                )
                mask = np.where(mask > self.max_boxes, 0, mask)  # truncated instances
                seg_masks.append(mask)
            elif self.task == "pose":
                kp = np.zeros((self.max_boxes, k, 3), np.float32)
                kpts = lab.get("keypoints", np.zeros((0, k, 3), np.float32))
                n = min(len(kpts), self.max_boxes)
                if n:
                    kp[:n] = kpts[:n]
                kpts_l.append(kp)
        out = {
            # uint8 to the device; the jitted train step normalizes in-graph
            # (4x less host->device traffic than f32)
            "images": np.stack(images),
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
        rank, world = self.shard
        if world > 1 and len(chunks) >= world:
            # disjoint per-process slice, equal length on every process so
            # the collective-bearing train steps stay in lockstep
            per = len(chunks) // world
            chunks = chunks[rank * per : (rank + 1) * per]

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
