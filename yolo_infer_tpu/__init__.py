"""yolo_infer_tpu — a TPU-native YOLO11 inference/training framework.

A from-scratch rebuild of the capability surface of t0saki/YOLO-Infer
(reference: /root/reference) designed TPU-first:

* model math (backbone/neck/head, pre/post-processing, NMS, losses) is pure
  JAX/XLA with Pallas kernels on the hot paths — the reference delegated all
  of this to the `ultralytics` PyTorch package (reference requirements.txt:4);
* scaling is expressed via `jax.sharding.Mesh` + NamedSharding/pjit instead of
  torch.distributed DDP (reference core/robust_trainer.py:337-339);
* quantization targets int8 MXU matmuls instead of fbgemm/qnnpack
  (reference optimization/quantization/quantizers.py).

Public surface mirrors the reference (core/model.py, core/trainer.py,
core/validator.py, optimization/, demos/, benchmarks/, utils/).
"""

__version__ = "0.1.0"


def __getattr__(name):  # lazy: keep `import yolo_infer_tpu` light
    if name in ("YOLO11Model", "YOLO11Factory"):
        from yolo_infer_tpu.core import model as _m

        return getattr(_m, name)
    if name in ("Predictor", "Results", "LazyMasks"):
        from yolo_infer_tpu.core import predictor as _p

        return getattr(_p, name)
    raise AttributeError(name)
