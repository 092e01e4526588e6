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

_RESIZE_W_CACHE: dict = {}


def _bilinear_resize_matrix(out_size: int, in_size: int) -> np.ndarray:
    """(out, in) f32 interpolation-weight matrix reproducing
    ``jax.image.resize(method='bilinear')`` along one axis (half-pixel
    centers, edge-clamped taps). Bilinear resize is a linear map, so the
    matrix is EXACT. Non-integer-ratio fallback only — the serving case
    (integer ratio) goes through the fused Pallas kernel; see the cost
    history in ops/pallas/mask_pack.py. Rows have <=2 nonzeros; the
    640x160 constant is 400 KB and baked into the executable."""
    key = (out_size, in_size)
    if key not in _RESIZE_W_CACHE:
        i = np.arange(out_size, dtype=np.float64)
        src = (i + 0.5) * (in_size / out_size) - 0.5
        lo = np.floor(src).astype(np.int64)
        frac = src - lo
        w = np.zeros((out_size, in_size), np.float32)
        rows = np.arange(out_size)
        np.add.at(w, (rows, np.clip(lo, 0, in_size - 1)), (1.0 - frac).astype(np.float32))
        np.add.at(w, (rows, np.clip(lo + 1, 0, in_size - 1)), frac.astype(np.float32))
        # cache NUMPY (a jnp array built under a trace would leak the tracer)
        _RESIZE_W_CACHE[key] = w
    return _RESIZE_W_CACHE[key]


def _phase_taps(m: jnp.ndarray, r: int, axis: int):
    """Per-phase 2-tap bilinear reads for an integer upsample ratio r along
    `axis`: output index i*r+k = w0_k*m[i+d_k] + w1_k*m[i+d_k+1] with
    phase-constant offset off_k = (k+0.5)/r - 0.5 and edge-clamped taps —
    jax.image.resize half-pixel semantics. Yields r arrays shaped like m
    (phase-major, UN-interleaved: interleaving along a minor axis is a lane
    shuffle Mosaic pays dearly for — the caller folds the interleave into a
    cheap contiguous merge or the bit-pack instead)."""
    s0 = m
    s_m1 = jnp.concatenate([lax.slice_in_dim(m, 0, 1, axis=axis), lax.slice_in_dim(m, 0, -1, axis=axis)], axis=axis)
    s_p1 = jnp.concatenate([lax.slice_in_dim(m, 1, None, axis=axis), lax.slice_in_dim(m, -1, None, axis=axis)], axis=axis)
    for k in range(r):
        off = (k + 0.5) / r - 0.5
        if off < 0:
            yield (-off) * s_m1 + (1.0 + off) * s0
        else:
            yield (1.0 - off) * s0 + off * s_p1


def _upsample_threshold_pack(soft: jnp.ndarray, r: int, thresh: float = 0.5) -> jnp.ndarray:
    """(n, h, w) f32 -> bit-packed (n, r*h, r*w//8) uint8 of
    ``bilinear_upsample_rx(soft) > thresh`` — the whole serving mask tail in
    one fused elementwise program.

    The naive form (materialize the (n, rh, rw) f32 upsample, threshold,
    pack) moves ~0.5 GB/image through HBM at n=300, imgsz=640 and measured
    92-113 ms/batch at b32 however the resize is computed (VPU gather,
    dense MXU matmuls, phase+interleave). This form never builds the
    upsampled image: phases stay un-interleaved, the threshold binarizes at
    source resolution per (H-phase, W-phase), and the W-interleave is folded
    into the BIT-PACK — out pixel 8B+j reads W-phase j%%r of source column
    rB//? ... concretely for r=4: bits 0-3 of byte B are W-phases 0-3 of src
    col 2B, bits 4-7 are W-phases 0-3 of col 2B+1, so the byte is a weighted
    sum of phase arrays reshaped (w) -> (w/2, 2) — contiguous splits and
    merges only, no lane shuffles. The H-interleave is a free row-major
    merge of (h, r) -> rh. Requires (r*w) %% 8 == 0."""
    n, h, w = soft.shape
    rw = r * w
    if rw % 8:
        raise ValueError(f"r*w = {rw} not a multiple of 8")
    cols_per_byte = 8 // r if r <= 8 else 1  # src cols feeding one byte
    out_kh = []
    for rowk in _phase_taps(soft, r, axis=1):  # H-phase kh: (n, h, w)
        # W phases of this H-phase row set, binarized at source layout
        bits = [(c > thresh) for c in _phase_taps(rowk, r, axis=2)]  # r x (n,h,w)
        # byte B covers out cols 8B..8B+7 = W-phases 0..r-1 of src cols
        # B*cpb .. B*cpb+cpb-1 (cpb = 8/r); bit j (MSB-first) = phase j%r of
        # src col B*cpb + j//r
        byte = None
        for j in range(8):
            kw, p = j % r, j // r
            # src cols p, p+cpb, p+2*cpb, ... -> contiguous (w/cpb, cpb) split
            part = bits[kw].reshape(n, h, w // cols_per_byte, cols_per_byte)[..., p]
            term = part.astype(jnp.int32) * int(_BIT_WEIGHTS[j])
            byte = term if byte is None else byte + term
        out_kh.append(byte.astype(jnp.uint8))  # (n, h, rw//8)
    out = jnp.stack(out_kh, axis=2)  # (n, h, r, rw//8) — sublane-side stack
    return out.reshape(n, r * h, rw // 8)  # row-major merge: free


def _upsample_bilinear_mm(m: jnp.ndarray, out_hw) -> jnp.ndarray:
    """(n, h, w) -> (n, H, W) bilinear upsample exactly matching
    ``jax.image.resize(..., method='bilinear')`` (tests pin this), f32-exact
    (the output is thresholded at 0.5; bf16-pass error ~2e-3 would flip
    near-threshold cells), as two dense interpolation-matrix MXU matmuls.
    Used as the non-integer-ratio fallback; the serving path (integer ratio)
    uses the fused _upsample_threshold_pack instead."""
    hh, ww = out_hw
    wh = jnp.asarray(_bilinear_resize_matrix(hh, m.shape[1]))
    wwm = jnp.asarray(_bilinear_resize_matrix(ww, m.shape[2]))
    up = jnp.einsum("nhw,Hh->nHw", m, wh, precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("nHw,Ww->nHW", up, wwm, precision=jax.lax.Precision.HIGHEST)


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


def _soft_even_odd(p, c, bx, imgsz):
    """Sigmoid+cropped mask values for EVEN and ODD source columns as two
    (max_det, Hm, Wm/2) arrays — the input layout of the fused Pallas pack
    kernel. Same matmul/crop convention as _instance_logits_and_crop, just
    computed on proto[:, par::2] (the parity split costs one slice of the
    3 MB proto instead of a lane shuffle of 30 MB of masks)."""
    hm, wm, nm = p.shape
    scale = hm / imgsz
    ys = jnp.arange(hm, dtype=jnp.float32)[None, :, None]
    bxs = bx.astype(jnp.float32) * scale
    out = []
    for par in (0, 1):
        pe = p[:, par::2, :]
        logits = (pe.reshape(-1, nm).astype(jnp.float32) @ c.astype(jnp.float32).T).T.reshape(-1, hm, wm // 2)
        xs = jnp.arange(par, wm, 2, dtype=jnp.float32)[None, None, :]
        keep = (
            (xs >= bxs[:, 0, None, None])
            & (xs < bxs[:, 2, None, None])
            & (ys >= bxs[:, 1, None, None])
            & (ys < bxs[:, 3, None, None])
        )
        out.append(jax.nn.sigmoid(logits) * keep)
    return out[0], out[1]


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


_BIT_REPEAT_LUT: dict = {}


def _bit_repeat_lut(s: int) -> np.ndarray:
    """(256, s) uint8: byte b -> s bytes whose bits repeat each bit of b
    s times (MSB-first, matching unpack_mask_bits)."""
    if s not in _BIT_REPEAT_LUT:
        bits = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1)  # (256, 8)
        _BIT_REPEAT_LUT[s] = np.packbits(bits.repeat(s, axis=1), axis=1)  # (256, s)
    return _BIT_REPEAT_LUT[s]


def repeat_mask_bits(packed: np.ndarray, s: int) -> np.ndarray:
    """Nearest-neighbor s-x upsample in the PACKED bit domain:
    (..., H, B) uint8 -> (..., s*H, s*B), each source bit duplicated into an
    s x s block. Equivalent to unpack -> np.repeat(s, -2).repeat(s, -1) ->
    pack, but ~10x cheaper on host: the column duplication is one 256-entry
    LUT gather on the 32x-smaller packed bytes and the row duplication
    repeats packed rows — the expensive full-res boolean image is built
    exactly once, by the caller's single unpackbits. Requires 8 % s == 0
    (the device_half consumption path: s=2)."""
    if s == 1:
        return packed
    if 8 % s:
        raise ValueError(f"bit-repeat factor {s} must divide 8")
    lut = _bit_repeat_lut(s)
    out = lut[packed]  # (..., H, B, s)
    out = out.reshape(packed.shape[:-1] + (packed.shape[-1] * s,))
    return out.repeat(s, axis=-2)


def assemble_mask_bits_up(
    proto: jnp.ndarray,  # (B, Hm, Wm, nm)
    coefs: jnp.ndarray,  # (B, max_det, nm)
    boxes_px: jnp.ndarray,  # (B, max_det, 4) xyxy in letterboxed pixels
    imgsz: int,
    out_size: int | None = None,
) -> jnp.ndarray:
    """Serving masks entirely on device: sigmoid -> crop (at proto res) ->
    bilinear upsample to (out_size, out_size) -> 0.5-threshold -> bit-pack
    along W. ``out_size`` defaults to ``imgsz`` (full resolution).

    This is the exact ultralytics serving pipeline — ``process_mask(
    upsample=True)`` then ``.gt_(0.5)`` — with the interpolation on the
    accelerator, where the reference's ``F.interpolate`` also runs. The
    output is (B, max_det, out_size, out_size//8) uint8: out_size²/8 bytes
    per instance, pulled to the host only if ``Results.masks`` is actually
    read (see ``core.predictor.LazyMasks``). ``lax.map`` over the batch
    bounds the (max_det, out_size, out_size) f32 upsample intermediate to
    one image.

    ``out_size = imgsz // 2`` is the ``mask_mode='device_half'`` serving
    variant: masks are thresholded on the half grid and nearest-upsampled
    2x on the host — boundary error <= 1 px at full resolution, for 4x less
    device->host transfer (the tunnel transfer is the consumption floor,
    PERF_MATRIX seg_mask_read row).
    """
    b, hm, wm, nm = proto.shape
    out = int(out_size) if out_size else imgsz
    if out % 8:
        raise ValueError(f"mask out_size {out} not a multiple of 8")

    ratio = out // hm
    integer_r = ratio >= 1 and out == ratio * hm and out == ratio * wm and 8 % ratio == 0
    # fused Pallas kernel: the full-res serving case only (proto stride 4)
    use_kernel = out == imgsz and ratio == 4 and wm % 2 == 0

    def one(args):
        p, c, bx = args
        if use_kernel:
            # fused Pallas tail: soft even/odd columns in (the parity split
            # is free — the proto matmul just runs on proto[:, par::2]),
            # packed bytes out; VMEM-resident per instance tile. 74 -> 8.5 ms
            # /batch vs the best XLA form at n/b32/640 (ops/pallas/mask_pack)
            from yolo_infer_tpu.ops.nms import _on_tpu
            from yolo_infer_tpu.ops.pallas.mask_pack import upsample4x_threshold_pack

            s_e, s_o = _soft_even_odd(p, c, bx, imgsz)
            return upsample4x_threshold_pack(s_e, s_o, interpret=not _on_tpu())
        logits, keep = _instance_logits_and_crop(p, c, bx, imgsz)
        soft = jax.nn.sigmoid(logits) * keep
        if integer_r:
            # phase-decomposed XLA fallback (never materializes the
            # (max_det, out, out) f32 image)
            return _upsample_threshold_pack(soft, ratio)
        up = _upsample_bilinear_mm(soft, (out, out))
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
