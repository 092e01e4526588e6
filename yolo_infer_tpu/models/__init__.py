from yolo_infer_tpu.models.spec import ModelSpec, build_spec, SIZES, TASKS  # noqa: F401
from yolo_infer_tpu.models.yolo11 import (  # noqa: F401
    build_model,
    cast_params,
    fold_model,
    forward,
    param_count,
)
