"""Quantizers: dynamic int8, post-training (calibrated) int8, QAT.

API parity with the reference quantizers (reference optimization/
quantization/quantizers.py: PostTrainingQuantizer :24 prepare->calibrate->
convert :48-91 with <=100 calibration batches :41,146-177; DynamicQuantizer
:311; QATQuantizer :493 with its own training loop :636-672 and per-epoch
checkpoints :605-616; QuantizationUtils :769-849; create_quantizer :860-889),
re-targeted from fbgemm/qnnpack eager quantization to the TPU int8 MXU path
(nn.quantize): per-channel int8 weights, per-tensor activations, int8xint8->
int32 convolutions rescaled in fp32. Unlike the reference's QAT (placeholder
loss returning 0, quantizers.py:678-681), QAT here trains with the real
detection loss under fake-quant.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np

from yolo_infer_tpu.optimization.base import (
    BaseOptimizer,
    OptimizationRegistry,
    QuantizationOptimizer,
)

logger = logging.getLogger(__name__)

MAX_CALIBRATION_BATCHES = 100  # parity: reference quantizers.py:41


def _quantized_clone(model, act_scales=None, qparams=None):
    """Clone a YOLO11Model with int8 deploy params (+ optional PTQ scales)."""
    import jax.numpy as jnp

    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.nn.quantize import quantize_params_tree

    if qparams is None:
        qparams = quantize_params_tree(model.deploy_params)
    return YOLO11Model.from_params(
        qparams,
        task=model.task,
        size=model.size,
        nc=model.nc,
        names=model.names,
        fused=True,
        quant_act_scales=None if act_scales is None else jnp.asarray(act_scales),
        compute_dtype=model.compute_dtype,
        model_path=f"{model.model_path}-int8",
    )


class DynamicQuantizer(QuantizationOptimizer):
    """Weights int8 offline; activation scales computed on-device per call
    (reference quantizers.py:311-373's quantize_dynamic analog)."""

    def optimize(self) -> Any:
        t0 = time.perf_counter()
        qmodel = _quantized_clone(self.model)
        self.optimized_model = qmodel
        self.optimization_info = {
            "method": "dynamic",
            "dtype": self.dtype,
            "activation_scales": "dynamic (per-tensor absmax, on-device)",
            "weight_scales": "per-output-channel",
            "time_s": time.perf_counter() - t0,
        }
        logger.info("dynamic int8 quantization done in %.1fs", self.optimization_info["time_s"])
        return qmodel


class PostTrainingQuantizer(QuantizationOptimizer):
    """PTQ: observe activation ranges over calibration batches, bake static
    scales (prepare -> calibrate -> convert; reference quantizers.py:48-177)."""

    def __init__(self, model: Any, config: Optional[Dict[str, Any]] = None):
        super().__init__(model, config)
        self.num_calibration_batches = int(self.config.get("num_calibration_batches", MAX_CALIBRATION_BATCHES))
        self.imgsz = int(self.config.get("imgsz", 640))

    def optimize(self) -> Any:
        if not self.calibration_data:
            raise RuntimeError("set_calibration_data() first (PTQ needs calibration batches)")
        import jax.numpy as jnp

        from yolo_infer_tpu.nn.quantize import quantize_params_tree

        t0 = time.perf_counter()
        # quantize FIRST, then calibrate on the quantized tree: observe8
        # records (in, out) absmax at exactly the convs static8 will consume,
        # with the quantized weights' activation statistics
        qparams = quantize_params_tree(self.model.deploy_params)
        scales = self._calibrate(qparams)  # (n_quantized_convs, 2)
        qmodel = _quantized_clone(self.model, act_scales=scales, qparams=qparams)
        self.optimized_model = qmodel
        self.optimization_info = {
            "method": "ptq",
            "dtype": self.dtype,
            "num_calibration_batches": min(len(self.calibration_data), self.num_calibration_batches),
            "num_observed_convs": int(len(scales)),
            "activation_path": "int8 residency (static in/out scales, fused requant)",
            "time_s": time.perf_counter() - t0,
        }
        logger.info("PTQ done: %d convs calibrated in %.1fs", len(scales), self.optimization_info["time_s"])
        return qmodel

    def _calibrate(self, qparams) -> np.ndarray:
        """Observe-mode forwards over the quantized tree; per-conv (input,
        output) absmax aggregated by max over calibration batches."""
        import jax
        import jax.numpy as jnp

        from yolo_infer_tpu.models.yolo11 import forward
        from yolo_infer_tpu.nn.quantize import QuantContext, quant_context
        from yolo_infer_tpu.ops.preprocess import preprocess_batch

        model = self.model
        spec = model.spec
        imgsz = self.imgsz

        @jax.jit
        def observe(p, images_u8):
            x = preprocess_batch(images_u8, out_hw=(imgsz, imgsz), dtype=model.compute_dtype)
            with quant_context(QuantContext("observe8")) as ctx:
                forward(p, None, spec, x, compute_dtype=model.compute_dtype)
                return jnp.stack(ctx.collected)  # (n, 2)

        agg: Optional[np.ndarray] = None
        for i, batch in enumerate(self.calibration_data[: self.num_calibration_batches]):
            batch = np.asarray(batch)
            if batch.ndim == 3:
                batch = batch[None]
            if batch.dtype != np.uint8:
                batch = np.clip(batch * 255 if batch.max() <= 1.0 else batch, 0, 255).astype(np.uint8)
            absmax = np.asarray(observe(qparams, jnp.asarray(batch)))
            agg = absmax if agg is None else np.maximum(agg, absmax)
        assert agg is not None
        return agg


class QATQuantizer(QuantizationOptimizer):
    """Quantization-aware training: fake-quant (STE) inside the real jitted
    training step, then int8 conversion of the trained EMA weights.

    The reference's QAT ran an Adam loop with a placeholder zero loss
    (quantizers.py:636-681); here the fake-quant flows through the actual
    TAL detection loss, with checkpoint/resume via the standard trainer.
    """

    def __init__(self, model: Any, config: Optional[Dict[str, Any]] = None):
        super().__init__(model, config)
        self.epochs = int(self.config.get("epochs", 10))
        self.lr = float(self.config.get("lr", 1e-4))

    def optimize(
        self,
        data: Optional[str] = None,
        resume: bool = False,
        checkpoint_period: int = 1,
        **train_kw,
    ) -> Any:
        data = data or self.config.get("data")
        if not data:
            raise RuntimeError("QAT needs a dataset: pass data=... (YOLO yaml)")
        from yolo_infer_tpu.core.trainer import TrainingConfig, YOLO11Trainer

        t0 = time.perf_counter()
        kw = {"mosaic": 0.0, "name": "qat"}  # defaults the caller may override
        kw.update(train_kw)
        cfg = TrainingConfig(
            data=str(data), epochs=self.epochs, lr0=self.lr, cos_lr=True,
            save_period=checkpoint_period, resume=resume, qat=True, **kw,
        )
        trainer = YOLO11Trainer(model=self.model, config=cfg)
        train_result = trainer.train()
        qmodel = _quantized_clone(self.model)
        self.optimized_model = qmodel
        self.optimization_info = {
            "method": "qat",
            "dtype": self.dtype,
            "epochs": self.epochs,
            "train_status": train_result.get("status"),
            "time_s": time.perf_counter() - t0,
        }
        return qmodel


class QuantizationUtils:
    """Size/speed/introspection helpers (reference quantizers.py:769-849)."""

    @staticmethod
    def compare_model_sizes(original, quantized) -> Dict[str, float]:
        from yolo_infer_tpu.utils.helpers import calculate_model_size

        a = calculate_model_size(original.deploy_params)
        b = calculate_model_size(quantized.deploy_params)
        return {
            "original_mb": a["size_mb"],
            "quantized_mb": b["size_mb"],
            "compression_ratio": a["size_mb"] / max(b["size_mb"], 1e-9),
        }

    @staticmethod
    def benchmark_inference_speed(original, quantized, imgsz: int = 640, batch: int = 8, runs: int = 20) -> Dict[str, Any]:
        a = original.benchmark(imgsz=imgsz, batch=batch, runs=runs, warmup=5)
        b = quantized.benchmark(imgsz=imgsz, batch=batch, runs=runs, warmup=5)
        return {"original": a, "quantized": b, "speedup": a["avg_time_s"] / b["avg_time_s"]}

    @staticmethod
    def is_quantized(model) -> bool:
        import jax

        leaves = jax.tree_util.tree_leaves(model.deploy_params)
        return any(getattr(leaf, "dtype", None) == np.dtype("int8") for leaf in leaves)


OptimizationRegistry.register("dynamic", DynamicQuantizer)
OptimizationRegistry.register("ptq", PostTrainingQuantizer)
OptimizationRegistry.register("qat", QATQuantizer)


def create_quantizer(
    method: str,
    model: Any,
    config: Optional[Dict[str, Any]] = None,
) -> QuantizationOptimizer:
    """Factory mapping {'ptq','dynamic','qat'} (reference quantizers.py:860-889)."""
    mapping = {"ptq": PostTrainingQuantizer, "dynamic": DynamicQuantizer, "qat": QATQuantizer}
    if method not in mapping:
        raise ValueError(f"unknown quantization method {method!r}; expected one of {sorted(mapping)}")
    return mapping[method](model, config)
