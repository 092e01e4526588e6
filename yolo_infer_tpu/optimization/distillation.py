"""Knowledge distillation: teacher -> student training — implemented.

The reference only *declares* this capability (reference optimization/base.py
:290-314: a `DistillationOptimizer` ABC with temperature=4.0 / alpha=0.7 and
an abstract `optimize`). This build implements it TPU-natively:

  * The frozen teacher runs INSIDE the student's jitted training step
    (core/train_step.py `distill=`): one XLA program does teacher forward
    (stop_gradient), student forward+backward, and the update — the teacher's
    activations never leave the device and its FLOPs overlap the student's
    pipeline. Teacher params are fused (BN-folded) deploy params, replicated
    under GSPMD when the step is meshed.
  * Every YOLO11 size shares the head layout (4*reg_max + nc channels at
    strides 8/16/32), so a bigger teacher's raw maps align with the student's
    per anchor — the KD loss (core/losses.py distill_detect_loss) needs no
    projection layers. Classify distills the classic Hinton softened-softmax
    KL (distill_classify_loss).
  * loss = alpha * soft + (1 - alpha) * hard, with the reference's declared
    defaults (alpha=0.7, T=4.0).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from yolo_infer_tpu.optimization.base import BaseOptimizer, OptimizationRegistry

logger = logging.getLogger(__name__)


class DistillationOptimizer(BaseOptimizer):
    """Distill a (larger) teacher into self.model.

    Config keys:
      teacher      teacher model — a YOLO11Model, or a name/path string
                   ('yolo11m', 'best.msgpack'); may instead be passed to
                   optimize(teacher=...)
      temperature  softening temperature (4.0, reference base.py:303)
      alpha        soft-loss weight in a*soft + (1-a)*hard (0.7, :304)

    optimize(data, teacher=None, epochs=10, **train_kw) trains a COPY of
    self.model (the original stays intact for compare_models) and returns it.
    """

    def __init__(self, model: Any, config: Optional[Dict[str, Any]] = None):
        super().__init__(model, config)
        self.temperature = float(self.config.get("temperature", 4.0))
        self.alpha = float(self.config.get("alpha", 0.7))
        self.teacher = self.config.get("teacher")

    def _resolve_teacher(self, teacher: Any):
        from yolo_infer_tpu.core.model import YOLO11Model

        teacher = teacher if teacher is not None else self.teacher
        if teacher is None:
            raise ValueError("distillation needs a teacher (config['teacher'] or optimize(teacher=...))")
        if isinstance(teacher, (str,)):
            teacher = YOLO11Model(teacher, task=self.model.task, nc=self.model.nc)
        s = self.model
        if teacher.task != s.task:
            raise ValueError(f"teacher task {teacher.task!r} != student task {s.task!r}")
        if teacher.nc != s.nc:
            raise ValueError(f"teacher nc {teacher.nc} != student nc {s.nc}")
        if teacher.task != "classify" and (
            teacher.spec.reg_max != s.spec.reg_max or tuple(teacher.spec.strides) != tuple(s.spec.strides)
        ):
            raise ValueError("teacher/student head layouts differ (reg_max or strides)")
        return teacher

    def _student_copy(self):
        from yolo_infer_tpu.core.model import YOLO11Model

        m = self.model
        if m.state is None:
            raise ValueError(
                "distillation trains the student; training-form (unfused) params are "
                f"required but {m.model_path!r} was loaded fused"
            )
        return YOLO11Model.from_params(
            jax.tree_util.tree_map(jnp.copy, m.params),
            task=m.task, size=m.size, nc=m.nc, names=m.names, fused=False,
            state=jax.tree_util.tree_map(jnp.copy, m.state),
            compute_dtype=m.compute_dtype, model_path=f"{m.model_path}-distilled",
        )

    def optimize(self, data: str, teacher: Any = None, epochs: int = 10, **train_kw) -> Any:
        from yolo_infer_tpu.core.trainer import TrainingConfig, YOLO11Trainer

        teacher = self._resolve_teacher(teacher)
        student = self._student_copy()

        cfg = TrainingConfig(data=data, epochs=epochs, **train_kw)
        trainer = YOLO11Trainer(model=student, config=cfg)
        trainer.distill = {
            "params": teacher.deploy_params,
            "spec": teacher.spec,
            "temperature": self.temperature,
            "alpha": self.alpha,
        }
        out = trainer.train()

        from yolo_infer_tpu.models.yolo11 import param_count

        self.optimized_model = student
        self.optimization_info = {
            "teacher": teacher.model_path,
            "teacher_params": param_count(teacher.params),
            "student_params": param_count(student.params),
            "temperature": self.temperature,
            "alpha": self.alpha,
            "epochs_completed": out.get("epochs_completed"),
            "best_fitness": out.get("best_fitness"),
            "final_loss": (out["history"][-1].get("loss") if out.get("history") else None),
            "final_loss_kd": (out["history"][-1].get("loss_kd") if out.get("history") else None),
        }
        return student


OptimizationRegistry.register("distill", DistillationOptimizer)


def create_distiller(model: Any, config: Optional[Dict[str, Any]] = None) -> DistillationOptimizer:
    return DistillationOptimizer(model, config)
