"""On-device fused letterbox + normalize.

The reference letterboxes on host with cv2 then ships float32 CHW tensors to
the device (reference utils/data_loader.py:281-337). TPU-native we ship the
raw uint8 HWC frames (4x less PCIe/ICI traffic) and do resize + pad +
normalize on device, fused by XLA into the front of the forward graph
(SURVEY.md §7 hard-part 4).

Shapes are static under jit, so the letterbox geometry is computed in Python
at trace time and baked into the compiled program; one compilation per
distinct (batch, src_hw, dst_hw) — the right trade for streaming pipelines
where the source size is fixed.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from yolo_infer_tpu.ops.letterbox import PAD_VALUE, letterbox_params


@partial(jax.jit, static_argnames=("out_hw", "scaleup", "dtype"))
def preprocess_batch(
    images: jnp.ndarray,  # (B, H, W, 3) uint8, RGB
    out_hw: Tuple[int, int] = (640, 640),
    scaleup: bool = True,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """uint8 RGB frames -> letterboxed, /255-normalized (B, out_h, out_w, 3)."""
    _, h, w, _ = images.shape
    r, (dw, dh), (new_w, new_h) = letterbox_params((h, w), out_hw, scaleup)
    if (new_h, new_w) != (h, w):
        # antialias=False matches cv2.INTER_LINEAR (what YOLO11 checkpoints
        # were trained with); jax's default antialiased downsample would
        # shift the input distribution. Interpolate in f32 for precision.
        x = images.astype(jnp.float32)
        x = jax.image.resize(x, (x.shape[0], new_h, new_w, 3), method="linear", antialias=False)
        x = (x * (1.0 / 255.0)).astype(dtype)
    else:
        # no resize (square sources, the serving fast path): cast+scale fuse
        # into ONE u8-read/bf16-write pass — an f32 intermediate here costs
        # ~1.5 ms at batch 128 in pure HBM traffic
        x = (images.astype(jnp.float32) * (1.0 / 255.0)).astype(dtype)
    top = int(round(dh - 0.1))
    bottom = out_hw[0] - new_h - top
    left = int(round(dw - 0.1))
    right = out_hw[1] - new_w - left
    if (top, bottom, left, right) != (0, 0, 0, 0):
        x = jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)),
                    constant_values=jnp.asarray(PAD_VALUE / 255.0, dtype))
    return x
