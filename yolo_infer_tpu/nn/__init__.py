from yolo_infer_tpu.nn.layers import (  # noqa: F401
    conv2d,
    conv_block,
    fold_batchnorm,
    init_conv_block,
    max_pool,
    silu,
    upsample2x,
)
