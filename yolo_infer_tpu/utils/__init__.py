"""Utils package re-exports (parity: reference utils/__init__.py:10-22)."""

from yolo_infer_tpu.data.loader import load_image, load_video  # noqa: F401
from yolo_infer_tpu.utils.helpers import (  # noqa: F401
    Timer,
    calculate_model_size,
    format_bytes,
    format_time,
    get_device_info,
    load_config,
    merge_configs,
    save_config,
    setup_logging,
)
from yolo_infer_tpu.utils.visualization import create_video_writer, draw_detections  # noqa: F401
