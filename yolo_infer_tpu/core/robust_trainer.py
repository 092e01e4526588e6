"""Robust (error-skipping) trainer — the reference's signature feature, TPU-shaped.

The reference wraps every training batch in try/except and skips failures
(reference core/robust_trainer.py:448-456), classifies shape-mismatch errors
(:243-257), and can swallow whole-run failures into
{"error": ..., "error_skipped": True} (:199-209). Under XLA a jitted step
cannot catch per-example Python exceptions, so robustness decomposes into the
three layers SURVEY.md §5 prescribes:

1. host-side batch sanitation — corrupt images/labels are dropped/replaced
   before device dispatch (data.train_loader.TrainLoader._safe_record; the
   reference's shape mismatches originate from exactly this kind of bad data);
2. in-graph numeric guard — non-finite losses skip the optimizer update and
   are counted on-device (core.train_step, `skipped` counter);
3. run-level error envelope — this class: whole-run exceptions are caught,
   classified, and reported instead of raised when skip_errors=True.
"""

from __future__ import annotations

import logging
import traceback
from typing import Any, Dict, Optional, Union

import numpy as np

from yolo_infer_tpu.core.trainer import TrainingConfig, YOLO11Trainer

logger = logging.getLogger(__name__)


def classify_training_error(exc: Exception) -> str:
    """Map an exception to a coarse cause (reference robust_trainer.py:243-257)."""
    msg = f"{type(exc).__name__}: {exc}".lower()
    if "shape" in msg or "dimension" in msg or "broadcast" in msg:
        return "shape_mismatch"
    if "memory" in msg or "resource exhausted" in msg or "oom" in msg:
        return "out_of_memory"
    if "nan" in msg or "inf" in msg or "finite" in msg:
        return "numeric"
    if isinstance(exc, (FileNotFoundError, ValueError)):
        return "data"
    return "unknown"


class RobustYOLO11Trainer(YOLO11Trainer):
    """Trainer that completes despite bad samples and numeric blowups."""

    def __init__(self, *args, skip_errors: bool = True, **kw):
        super().__init__(*args, **kw)
        self.skip_errors = skip_errors

    def train(self, **kw) -> Dict[str, Any]:
        try:
            result = super().train(**kw)
        except Exception as exc:  # noqa: BLE001 — the whole point of this class
            cause = classify_training_error(exc)
            logger.error("training failed (%s): %s", cause, exc)
            if not self.skip_errors:
                raise
            return {
                "status": "failed",
                "error": str(exc),
                "error_type": cause,
                "error_skipped": True,
                "traceback": traceback.format_exc(),
            }
        skipped = result.get("skipped_steps", 0)
        if skipped:
            result["status"] = "completed_with_skipped_errors"
            result["skipped_batches"] = skipped
            logger.warning("training completed with %d skipped (non-finite) steps", skipped)
        return result


def create_robust_trainer(
    model_path: str = "yolo11n",
    config: Optional[Union[TrainingConfig, Dict[str, Any]]] = None,
    skip_errors: bool = True,
    **kw,
) -> RobustYOLO11Trainer:
    """Factory (reference robust_trainer.py:527-554)."""
    if isinstance(config, dict):
        config = TrainingConfig.from_dict(config)
    return RobustYOLO11Trainer(model_path=model_path, config=config, skip_errors=skip_errors, **kw)
