from yolo_infer_tpu.ops.letterbox import letterbox, scale_boxes  # noqa: F401
from yolo_infer_tpu.ops.decode import decode_detections, make_anchors  # noqa: F401
from yolo_infer_tpu.ops.nms import batched_nms  # noqa: F401
