"""Optimization framework: base classes, pipeline, registry.

API parity with the reference's optimization/base.py (BaseOptimizer ABC
:18-208 with optimize/evaluate/get_optimization_info/save/load/compare,
QuantizationOptimizer :232-262, OptimizationPipeline :317-404,
OptimizationRegistry :407-439). The reference declares PruningOptimizer
(:264-288) and DistillationOptimizer (:290-314) as abstract stubs; this
build IMPLEMENTS them (optimization/pruning.py, optimization/distillation.py).
Models here are YOLO11Model wrappers whose
deploy params are JAX pytrees; "optimized" artifacts are saved in the native
msgpack checkpoint format, not pickled torch modules.
"""

from __future__ import annotations

import abc
import json
import logging
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Type, Union

import numpy as np

logger = logging.getLogger(__name__)


class BaseOptimizer(abc.ABC):
    """Abstract model optimizer (quantization / pruning / distillation)."""

    def __init__(self, model: Any, config: Optional[Dict[str, Any]] = None):
        self.model = model
        self.config = config or {}
        self.optimized_model: Optional[Any] = None
        self.optimization_info: Dict[str, Any] = {}

    # -- contract ------------------------------------------------------------

    @abc.abstractmethod
    def optimize(self, *args, **kwargs) -> Any:
        """Produce and return the optimized model."""

    def evaluate(self, data: Optional[str] = None, imgsz: int = 640, batch: int = 16) -> Dict[str, Any]:
        """Accuracy/speed evaluation of the optimized model."""
        if self.optimized_model is None:
            raise RuntimeError("call optimize() first")
        if data:
            from yolo_infer_tpu.core.validator import YOLO11Validator

            return YOLO11Validator(model=self.optimized_model).validate(data, imgsz=imgsz, batch=batch, verbose=False)
        return self.optimized_model.benchmark(imgsz=imgsz, batch=batch, runs=20, warmup=5)

    def get_optimization_info(self) -> Dict[str, Any]:
        return dict(self.optimization_info)

    # -- persistence -----------------------------------------------------------

    def save_optimized_model(self, path: Union[str, Path]) -> Path:
        if self.optimized_model is None:
            raise RuntimeError("call optimize() first")
        path = Path(path)
        out = self.optimized_model.save(path, fused=True)
        info_path = path.with_suffix(".info.json")
        info_path.write_text(json.dumps(self.optimization_info, indent=2, default=float))
        return out

    @staticmethod
    def load_optimized_model(path: Union[str, Path]) -> Any:
        from yolo_infer_tpu.core.model import YOLO11Model

        return YOLO11Model(path)

    # -- comparison -----------------------------------------------------------

    def compare_models(self, imgsz: int = 640, batch: int = 8, runs: int = 20) -> Dict[str, Any]:
        """Original vs optimized: speed + size (reference base.py:177-208)."""
        if self.optimized_model is None:
            raise RuntimeError("call optimize() first")
        from yolo_infer_tpu.utils.helpers import calculate_model_size

        orig = self.model.benchmark(imgsz=imgsz, batch=batch, runs=runs, warmup=5)
        opt = self.optimized_model.benchmark(imgsz=imgsz, batch=batch, runs=runs, warmup=5)
        size_orig = calculate_model_size(self.model.deploy_params)
        size_opt = calculate_model_size(self.optimized_model.deploy_params)
        return {
            "original": {"avg_time_s": orig["avg_time_s"], "fps": orig["fps"], "size_mb": size_orig["size_mb"]},
            "optimized": {"avg_time_s": opt["avg_time_s"], "fps": opt["fps"], "size_mb": size_opt["size_mb"]},
            "speedup": orig["avg_time_s"] / opt["avg_time_s"],
            "compression_ratio": size_orig["size_mb"] / max(size_opt["size_mb"], 1e-9),
        }


class QuantizationOptimizer(BaseOptimizer):
    """Shared quantization config (reference base.py:232-262). On TPU the
    'backend' is always the MXU int8 path; the knob kept for parity."""

    SUPPORTED_DTYPES = ("int8",)

    def __init__(self, model: Any, config: Optional[Dict[str, Any]] = None):
        super().__init__(model, config)
        self.dtype = self.config.get("dtype", "int8")
        if self.dtype not in self.SUPPORTED_DTYPES:
            raise ValueError(f"dtype {self.dtype!r} not in {self.SUPPORTED_DTYPES}")
        self.calibration_data: Optional[Sequence[np.ndarray]] = None

    def set_calibration_data(self, data: Sequence[np.ndarray]) -> None:
        self.calibration_data = data


# PruningOptimizer and DistillationOptimizer live in optimization/pruning.py
# and optimization/distillation.py — the reference declares them as abstract
# stubs (reference base.py:264-314); this build implements them.


class OptimizationPipeline:
    """Chain of optimizers applied sequentially (reference base.py:317-404)."""

    def __init__(self, model: Any):
        self.model = model
        self.steps: List[BaseOptimizer] = []
        self.results: List[Dict[str, Any]] = []

    def add_step(self, optimizer: BaseOptimizer) -> "OptimizationPipeline":
        self.steps.append(optimizer)
        return self

    def run(self, **kwargs) -> Any:
        current = self.model
        for i, step in enumerate(self.steps):
            step.model = current
            t0 = time.perf_counter()
            current = step.optimize(**kwargs)
            self.results.append(
                {
                    "step": i,
                    "optimizer": type(step).__name__,
                    "time_s": time.perf_counter() - t0,
                    "info": step.get_optimization_info(),
                }
            )
        return current


class OptimizationRegistry:
    """Name -> optimizer class registry (reference base.py:407-439)."""

    _registry: Dict[str, Type[BaseOptimizer]] = {}

    @classmethod
    def register(cls, name: str, optimizer_cls: Type[BaseOptimizer]) -> None:
        cls._registry[name] = optimizer_cls

    @classmethod
    def get(cls, name: str) -> Type[BaseOptimizer]:
        if name not in cls._registry:
            raise KeyError(f"unknown optimizer {name!r}; registered: {sorted(cls._registry)}")
        return cls._registry[name]

    @classmethod
    def available(cls) -> List[str]:
        return sorted(cls._registry)
