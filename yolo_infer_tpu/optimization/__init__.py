"""Optimization subsystem: quantization (dynamic/PTQ/QAT), pruning,
distillation, pipeline + registry (reference optimization/).

Importing this package registers every optimizer with OptimizationRegistry:
'dynamic' | 'ptq' | 'qat' | 'prune' | 'distill'.
"""

from yolo_infer_tpu.optimization.base import (
    BaseOptimizer,
    OptimizationPipeline,
    OptimizationRegistry,
    QuantizationOptimizer,
)
from yolo_infer_tpu.optimization.distillation import DistillationOptimizer, create_distiller
from yolo_infer_tpu.optimization.pruning import PruningOptimizer, create_pruner
from yolo_infer_tpu.optimization.quantization.quantizers import (
    DynamicQuantizer,
    PostTrainingQuantizer,
    QATQuantizer,
    create_quantizer,
)

__all__ = [
    "BaseOptimizer",
    "QuantizationOptimizer",
    "PruningOptimizer",
    "DistillationOptimizer",
    "OptimizationPipeline",
    "OptimizationRegistry",
    "DynamicQuantizer",
    "PostTrainingQuantizer",
    "QATQuantizer",
    "create_quantizer",
    "create_pruner",
    "create_distiller",
]
