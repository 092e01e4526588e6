"""On-device segment mask assembly (VERDICT r2 next-step 5).

The reference's serving path inherits ultralytics ``process_mask``:
``sigmoid(proto @ coefs)`` cropped to each box. Round 2 ran that per image on
the host (numpy) — a wall in front of the device's seg throughput. Here the
whole thing happens inside the jitted program with fixed shapes:

    proto (B, Hm, Wm, nm) + coefs (B, max_det, nm) + boxes (B, max_det, 4)
    -> binary masks, bit-packed to (B, max_det, Hm, Wm//8) uint8

* threshold-at-0.5 on a sigmoid == logits > 0, so no sigmoid is evaluated;
* the (max_det, Hm, Wm) f32 intermediate never hits HBM for the whole batch
  at once: ``lax.map`` over the batch keeps it to one image (300x160x160 f32
  = 30 MB) while the per-image matmul still feeds the MXU;
* the bit-pack shrinks the device->host transfer 32x vs f32 masks (0.96 MB
  per image at 640², vs the 3.2 MB proto tensor the host path pulled).

The host unpacks with ``np.unpackbits`` (MSB-first, matching the pack dot).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_BIT_WEIGHTS = np.array([128, 64, 32, 16, 8, 4, 2, 1], np.int32)  # MSB-first


def _instance_logits_and_crop(p, c, bx, imgsz):
    """Shared per-image body of every assembly mode: (Hm*Wm,nm)@(nm,max_det)
    mask logits plus the box crop mask at proto resolution. One definition so
    the crop convention (xyxy, right/bottom-exclusive) cannot diverge
    between modes."""
    hm, wm, nm = p.shape
    scale = hm / imgsz
    ys = jnp.arange(hm, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(wm, dtype=jnp.float32)[None, None, :]
    logits = (p.reshape(-1, nm).astype(jnp.float32) @ c.astype(jnp.float32).T).T.reshape(-1, hm, wm)
    bxs = bx.astype(jnp.float32) * scale
    keep = (
        (xs >= bxs[:, 0, None, None])
        & (xs < bxs[:, 2, None, None])
        & (ys >= bxs[:, 1, None, None])
        & (ys < bxs[:, 3, None, None])
    )
    return logits, keep


def _bitpack_w(binm):
    """(n, H, W) bool -> (n, H, W//8) uint8, MSB-first along W."""
    n, h, w = binm.shape
    pw = jnp.asarray(_BIT_WEIGHTS)
    return jnp.sum(
        binm.reshape(n, h, w // 8, 8).astype(jnp.int32) * pw[None, None, None, :], axis=-1
    ).astype(jnp.uint8)


def assemble_mask_bits(
    proto: jnp.ndarray,  # (B, Hm, Wm, nm)
    coefs: jnp.ndarray,  # (B, max_det, nm)
    boxes_px: jnp.ndarray,  # (B, max_det, 4) xyxy in letterboxed pixels
    imgsz: int,
) -> jnp.ndarray:
    """Binary cropped instance masks, bit-packed along W. Identical semantics
    to the host path ``_assemble_masks(...) > 0.5`` at proto resolution
    (ultralytics process_mask order: sigmoid -> crop; tests/test_masks.py)."""
    b, hm, wm, nm = proto.shape
    if wm % 8:
        raise ValueError(f"proto width {wm} not a multiple of 8 (imgsz must be a multiple of 32)")

    def one(args):
        p, c, bx = args
        logits, keep = _instance_logits_and_crop(p, c, bx, imgsz)
        # threshold-at-0.5 on a sigmoid == logits > 0
        return _bitpack_w((logits > 0) & keep)

    return lax.map(one, (proto, coefs, boxes_px))


def unpack_mask_bits(packed: np.ndarray) -> np.ndarray:
    """(..., Hm, Wm//8) uint8 -> (..., Hm, Wm) bool (host side)."""
    return np.unpackbits(np.asarray(packed, np.uint8), axis=-1).astype(bool)


def assemble_mask_bits_up(
    proto: jnp.ndarray,  # (B, Hm, Wm, nm)
    coefs: jnp.ndarray,  # (B, max_det, nm)
    boxes_px: jnp.ndarray,  # (B, max_det, 4) xyxy in letterboxed pixels
    imgsz: int,
) -> jnp.ndarray:
    """Serving masks entirely on device: sigmoid -> crop (at proto res) ->
    bilinear upsample to (imgsz, imgsz) -> 0.5-threshold -> bit-pack along W.

    This is the exact ultralytics serving pipeline — ``process_mask(
    upsample=True)`` then ``.gt_(0.5)`` — with the interpolation on the
    accelerator, where the reference's ``F.interpolate`` also runs. The
    output is (B, max_det, imgsz, imgsz//8) uint8: imgsz²/8 bytes per
    instance, pulled to the host only if ``Results.masks`` is actually read
    (see ``core.predictor.LazyMasks``). ``lax.map`` over the batch bounds
    the (max_det, imgsz, imgsz) f32 upsample intermediate to one image.
    """
    b, hm, wm, nm = proto.shape
    if imgsz % 8:
        raise ValueError(f"imgsz {imgsz} not a multiple of 8")

    def one(args):
        p, c, bx = args
        logits, keep = _instance_logits_and_crop(p, c, bx, imgsz)
        soft = jax.nn.sigmoid(logits) * keep
        up = jax.image.resize(soft, (soft.shape[0], imgsz, imgsz), method="bilinear")
        return _bitpack_w(up > 0.5)

    return lax.map(one, (proto, coefs, boxes_px))


def assemble_masks_q8(
    proto: jnp.ndarray,  # (B, Hm, Wm, nm)
    coefs: jnp.ndarray,  # (B, max_det, nm)
    boxes_px: jnp.ndarray,  # (B, max_det, 4) xyxy in letterboxed pixels
    imgsz: int,
) -> jnp.ndarray:
    """SOFT cropped instance masks, uint8-quantized: round(sigmoid * 255).

    The serving-parity variant of :func:`assemble_mask_bits`. Ultralytics'
    serving order (process_mask(upsample=True)) upsamples the *float* sigmoid
    masks bilinearly and only then thresholds at 0.5 — binarizing first and
    upsampling the binaries (the bit path) flips sub-cell boundary pixels,
    which matters when objects are few proto cells wide. Quantizing to uint8
    instead keeps the order exact within 1/510 of the threshold (linear
    interpolation preserves the quantization bound), at 4x less transfer
    than f32. Host side: /255, bilinear upsample, threshold.
    """
    b, hm, wm, nm = proto.shape

    def one(args):
        p, c, bx = args
        logits, keep = _instance_logits_and_crop(p, c, bx, imgsz)
        q = jnp.round(jax.nn.sigmoid(logits) * 255.0) * keep
        return q.astype(jnp.uint8)

    return lax.map(one, (proto, coefs, boxes_px))
