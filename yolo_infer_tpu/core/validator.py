"""YOLO11Validator — batched validation with native mAP computation.

API parity with the reference's YOLO11Validator (reference core/validator.py:
validate :86 with defaults conf=0.001/iou=0.6/imgsz=640/batch=16 :121-136,
result extraction :329-361, benchmark_speed sweep :158-221, compare_models
:223-284, cross_validate :286-327, summary writers :473-624), but the val
engine itself is in-repo: the device runs a jitted
letterbox->forward->decode->NMS program per batch while the host overlaps
metric matching of the previous batch (double-buffered, SURVEY.md §7 step 4).
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np

from yolo_infer_tpu.core.metrics import DetMetrics
from yolo_infer_tpu.data.dataset import YOLODataset
from yolo_infer_tpu.ops.letterbox import scale_boxes
from yolo_infer_tpu.utils.helpers import setup_logging

logger = logging.getLogger(__name__)


def _boxes_to_original(raw: np.ndarray, ratio: float, pad, orig_shape) -> np.ndarray:
    """Map predicted boxes to original-image xyxy; rotated (5-col) boxes are
    unpadded/unscaled and reduced to axis-aligned envelopes for box metrics."""
    if raw.shape[-1] == 5:
        from yolo_infer_tpu.core.predictor import _obb_to_xyxy
        from yolo_infer_tpu.ops.letterbox import scale_obb

        return _obb_to_xyxy(scale_obb(raw, ratio, pad), orig_shape)
    return scale_boxes(raw, ratio, pad, orig_shape)


class YOLO11Validator:
    """Validate a YOLO11Model on a YOLO-format dataset."""

    def __init__(
        self,
        model: Any = None,
        model_path: Optional[str] = None,
        output_dir: Union[str, Path] = "validation_results",
        device: Optional[str] = None,
    ):
        if model is None:
            from yolo_infer_tpu.core.model import YOLO11Model

            model = YOLO11Model(model_path or "yolo11n", device=device)
        self.model = model
        self.output_dir = Path(output_dir)

    # ------------------------------------------------------------------ val

    def validate(
        self,
        data: Union[str, Path, Dict[str, Any]],
        imgsz: int = 640,
        batch: int = 16,
        conf: float = 0.001,
        iou: float = 0.6,
        max_det: int = 300,
        split: str = "val",
        save_json: bool = False,
        multi_label: bool = True,
        verbose: bool = True,
        confusion_matrix: bool = False,
        pre_topk: int = 4096,
        limit: Optional[int] = None,
    ) -> Dict[str, Any]:
        """Run validation; returns {metrics, speed, num_images, ...}.

        `limit` caps the split to its first N images (deterministic order) —
        for quick fidelity sweeps like tools/fetch_and_verify.py."""
        import jax.numpy as jnp

        from yolo_infer_tpu.core.metrics import ConfusionMatrix

        task = getattr(self.model, "task", "detect")
        ds_task = task if task in ("segment", "pose", "obb") else "detect"
        kpt_shape = getattr(self.model.spec, "kpt_shape", (17, 3))
        ds = YOLODataset(data, split=split, task=ds_task, kpt_shape=kpt_shape)
        if limit is not None:
            ds.images = ds.images[:limit]
        metrics = DetMetrics(nc=ds.nc)
        task_metrics = DetMetrics(nc=ds.nc) if ds_task in ("segment", "pose") else None
        cm = ConfusionMatrix(nc=ds.nc) if confusion_matrix else None
        predictor = self.model.predictor

        t_start = time.perf_counter()
        n_images = 0
        infer_time = 0.0
        pending = None  # (host_future_dets, metas, n) — overlap device/host

        def drain(dets_np, metas, n):
            for i in range(n):
                m = metas[i]
                k = int(dets_np["num"][i])
                boxes = _boxes_to_original(dets_np["boxes"][i, :k], m["ratio"], m["pad"], m["orig_shape"])
                metrics.update(
                    boxes,
                    dets_np["scores"][i, :k],
                    dets_np["classes"][i, :k].astype(np.int32),
                    m["boxes"],
                    m["classes"],
                )
                if cm is not None:
                    cm.process_batch(
                        boxes, dets_np["scores"][i, :k], dets_np["classes"][i, :k],
                        m["boxes"], m["classes"],
                    )
                if task_metrics is not None:
                    self._update_task_metrics(task_metrics, ds_task, dets_np, i, k, m, imgsz)

        from yolo_infer_tpu.utils.helpers import device_busy

        for batch_data in ds.iter_val_batches(batch_size=batch, imgsz=imgsz):
            t0 = time.perf_counter()
            # pre_topk=4096 for val: at conf=0.001 the multi-label candidate
            # pool exceeds the serving cap; 4096 is cap-insensitive even when
            # the pool saturates max_det (tests/test_nms.py dense-regime test)
            dets = predictor.predict_raw(
                jnp.asarray(batch_data["images"]), conf, iou, imgsz,
                multi_label=multi_label, max_det=max_det, pre_topk=pre_topk,
                mask_out="bits" if ds_task == "segment" else None,
            )
            if pending is not None:
                drain(*pending)  # host matches previous batch while device runs
            with device_busy():  # sync wait = device still computing
                dets_np = {k: np.asarray(v) for k, v in dets.items() if v is not None}
            infer_time += time.perf_counter() - t0
            pending = (dets_np, batch_data["metas"], batch_data["n"])
            n_images += batch_data["n"]
        if pending is not None:
            drain(*pending)

        results = metrics.compute()
        task_results = task_metrics.compute() if task_metrics is not None else None
        total_time = time.perf_counter() - t_start
        out = {
            "metrics": {
                "mAP50-95": results["map"],
                "mAP50": results["map50"],
                "mAP75": results["map75"],
                "precision": results["precision"],
                "recall": results["recall"],
            },
            "per_class_ap50": results.get("per_class_ap50", {}),
            "num_images": n_images,
            "speed": {
                "total_s": total_time,
                "inference_ms_per_image": infer_time / max(n_images, 1) * 1e3,
                "images_per_s": n_images / max(total_time, 1e-9),
            },
            "config": {"imgsz": imgsz, "batch": batch, "conf": conf, "iou": iou, "split": split},
        }
        if task_results is not None:
            key = "mask_metrics" if ds_task == "segment" else "pose_metrics"
            out[key] = {
                "mAP50-95": task_results["map"],
                "mAP50": task_results["map50"],
                "mAP75": task_results["map75"],
            }
        if verbose:
            logger.info("validated %d images: mAP50-95=%.4f mAP50=%.4f", n_images, results["map"], results["map50"])
        self._save_validation_summary(out)
        if cm is not None:
            self.output_dir.mkdir(parents=True, exist_ok=True)
            text = cm.to_text(ds.names)
            (self.output_dir / "confusion_matrix.txt").write_text(text + "\n")
            out["confusion_matrix"] = cm.matrix.tolist()
        if save_json:
            (self.output_dir / "validation_results.json").write_text(json.dumps(out, indent=2, default=float))
        return out

    def _update_task_metrics(self, task_metrics, ds_task, dets_np, i, k, m, imgsz):
        """Mask-IoU (segment) or OKS (pose) matching for image i of a batch."""
        from yolo_infer_tpu.core.metrics import mask_iou_matrix, oks_matrix
        from yolo_infer_tpu.core.predictor import _assemble_masks
        from yolo_infer_tpu.data.dataset import polygons_to_instance_masks

        scores = dets_np["scores"][i, :k]
        cls = dets_np["classes"][i, :k].astype(np.int32)
        if ds_task == "segment":
            polys = m.get("polygons", [])
            gt_masks = polygons_to_instance_masks(polys, m["orig_shape"], m["ratio"], m["pad"], imgsz)
            if k > 0 and "mask_bits" in dets_np:
                from yolo_infer_tpu.ops.masks import unpack_mask_bits

                # device path: binary masks computed in-graph (ops/masks.py)
                pred_masks = unpack_mask_bits(dets_np["mask_bits"][i, :k])
            elif k > 0:
                pred_masks = _assemble_masks(
                    dets_np["proto"][i], dets_np["mask_coefs"][i, :k], dets_np["boxes"][i, :k], imgsz
                ) > 0.5
            else:
                pred_masks = np.zeros((0,) + gt_masks.shape[1:], bool)
            iou = mask_iou_matrix(pred_masks, gt_masks)
            task_metrics.update_from_iou(iou, scores, cls, m["classes"])
        else:  # pose: OKS in letterboxed pixel space
            gt_kpts = m.get("keypoints", np.zeros((0, 17, 3), np.float32)).copy()
            if len(gt_kpts):
                gt_kpts[..., 0] = gt_kpts[..., 0] * m["ratio"] + m["pad"][0]
                gt_kpts[..., 1] = gt_kpts[..., 1] * m["ratio"] + m["pad"][1]
            gt_boxes_lb = m["boxes"] * m["ratio"]
            areas = ((gt_boxes_lb[:, 2] - gt_boxes_lb[:, 0]) * (gt_boxes_lb[:, 3] - gt_boxes_lb[:, 1])) if len(gt_boxes_lb) else np.zeros((0,))
            pred_kpts = dets_np["kpts"][i, :k] if "kpts" in dets_np else np.zeros((0, gt_kpts.shape[1] if len(gt_kpts) else 17, 3))
            iou = oks_matrix(pred_kpts, gt_kpts, areas)
            task_metrics.update_from_iou(iou, scores, cls, m["classes"])

    # ------------------------------------------------------- speed benchmark

    def benchmark_speed(
        self,
        imgsz_list: Sequence[int] = (320, 640, 1280),
        batch_sizes: Sequence[int] = (1, 8, 16, 32),
        runs: int = 50,
    ) -> Dict[str, Any]:
        """Latency/throughput sweep (reference core/validator.py:158-221)."""
        results: Dict[str, Any] = {}
        for imgsz in imgsz_list:
            for b in batch_sizes:
                key = f"imgsz{imgsz}_batch{b}"
                try:
                    results[key] = self.model.benchmark(imgsz=imgsz, batch=b, runs=runs, warmup=5)
                except Exception as e:  # noqa: BLE001 — sweep continues (OOM on big configs)
                    logger.warning("benchmark %s failed: %s", key, e)
                    results[key] = {"error": str(e)}
        self.output_dir.mkdir(parents=True, exist_ok=True)
        (self.output_dir / "speed_benchmark.json").write_text(json.dumps(results, indent=2, default=float))
        return results

    # ------------------------------------------------------------- compare

    def compare_models(
        self,
        model_paths: Sequence[str],
        data: Union[str, Path, Dict[str, Any]],
        **val_kw,
    ) -> Dict[str, Any]:
        """Validate several checkpoints on the same data and rank them."""
        from yolo_infer_tpu.core.model import YOLO11Model

        rows = {}
        for path in model_paths:
            model = YOLO11Model(path)
            v = YOLO11Validator(model=model, output_dir=self.output_dir)
            r = v.validate(data, verbose=False, **val_kw)
            rows[str(path)] = {
                "mAP50-95": r["metrics"]["mAP50-95"],
                "mAP50": r["metrics"]["mAP50"],
                "images_per_s": r["speed"]["images_per_s"],
            }
        ranking = sorted(rows, key=lambda k: rows[k]["mAP50-95"], reverse=True)
        out = {"results": rows, "ranking": ranking, "best": ranking[0] if ranking else None}
        self.output_dir.mkdir(parents=True, exist_ok=True)
        (self.output_dir / "model_comparison.json").write_text(json.dumps(out, indent=2, default=float))
        return out

    def cross_validate(
        self,
        data: Union[str, Path, Dict[str, Any]],
        k: int = 5,
        split: str = "val",
        **val_kw,
    ) -> Dict[str, Any]:
        """K-fold over the split's images (real folds — the reference
        re-validated the identical split k times, core/validator.py:311-318)."""
        ds = YOLODataset(data, split=split)
        idx = np.arange(len(ds))
        rng = np.random.default_rng(0)
        rng.shuffle(idx)
        folds = np.array_split(idx, k)
        scores = []
        for fi, fold in enumerate(folds):
            sub = _SubsetDataset(ds, fold.tolist())
            metrics = self._validate_dataset(sub, **val_kw)
            scores.append(metrics["metrics"]["mAP50-95"])
            logger.info("fold %d/%d: mAP50-95=%.4f (%d imgs)", fi + 1, k, scores[-1], len(fold))
        return {
            "folds": scores,
            "mean_mAP50-95": float(np.mean(scores)),
            "std_mAP50-95": float(np.std(scores)),
            "k": k,
        }

    def _validate_dataset(self, ds, predictor=None, imgsz: int = 640, batch: int = 16, conf: float = 0.001, iou: float = 0.6, pre_topk: int = 4096, **kw) -> Dict[str, Any]:
        import jax.numpy as jnp

        predictor = predictor or self.model.predictor
        metrics = DetMetrics(nc=ds.nc)
        n_images = 0
        for batch_data in ds.iter_val_batches(batch_size=batch, imgsz=imgsz):
            dets = predictor.predict_raw(
                jnp.asarray(batch_data["images"]), conf, iou, imgsz, multi_label=True, pre_topk=pre_topk,
                # box-metric path never reads masks: skip mask assembly and
                # the per-batch mask transfer entirely
                mask_out="none" if predictor.spec.task == "segment" else None,
            )
            dets_np = {k2: np.asarray(v) for k2, v in dets.items() if v is not None}
            for i in range(batch_data["n"]):
                m = batch_data["metas"][i]
                kk = int(dets_np["num"][i])
                boxes = _boxes_to_original(dets_np["boxes"][i, :kk], m["ratio"], m["pad"], m["orig_shape"])
                metrics.update(boxes, dets_np["scores"][i, :kk], dets_np["classes"][i, :kk].astype(np.int32), m["boxes"], m["classes"])
            n_images += batch_data["n"]
        r = metrics.compute()
        return {"metrics": {"mAP50-95": r["map"], "mAP50": r["map50"], "mAP75": r["map75"], "precision": r["precision"], "recall": r["recall"]}, "num_images": n_images}

    # ------------------------------------------------------------- reporting

    def _save_validation_summary(self, results: Dict[str, Any]) -> None:
        self.output_dir.mkdir(parents=True, exist_ok=True)
        lines = ["Validation Summary", "=" * 40]
        for k, v in results["metrics"].items():
            lines.append(f"{k:>12}: {v:.4f}")
        sp = results["speed"]
        lines += [
            f"{'images':>12}: {results['num_images']}",
            f"{'img/s':>12}: {sp['images_per_s']:.1f}",
            f"{'ms/img':>12}: {sp['inference_ms_per_image']:.2f}",
        ]
        (self.output_dir / "validation_summary.txt").write_text("\n".join(lines) + "\n")


class _SubsetDataset:
    """View over a subset of a YOLODataset's images (for cross-validation)."""

    def __init__(self, ds: YOLODataset, indices: List[int]):
        self._ds = ds
        self._indices = indices
        self.nc = ds.nc
        self.names = ds.names

    def __len__(self):
        return len(self._indices)

    def __getitem__(self, i):
        return self._ds[self._indices[i]]

    def iter_val_batches(self, batch_size=16, imgsz=640):
        from yolo_infer_tpu.data.dataset import iter_letterboxed_batches

        yield from iter_letterboxed_batches(self, batch_size, imgsz)


def create_validator(model_path: str = "yolo11n", **kw) -> YOLO11Validator:
    """Factory (reference core/validator.py:639-672)."""
    return YOLO11Validator(model_path=model_path, **kw)
