"""Pallas TPU kernel: fused IoU-matrix + greedy-NMS-fixpoint, VMEM-resident.

The XLA production path (ops.nms._nms_fixpoint) materializes the (B, K, K)
pairwise-overlap matrix in HBM and re-reads it every sweep; at the serving
shape (B=128, K=512) building + sweeping that matrix measures ~2.1 ms on
v5e-1 — the single largest piece of the decode+NMS tail
(tools/profile_tail.py). This kernel computes the IoU matrix, the rank mask,
and the greedy fixpoint entirely in VMEM, one grid program per image: HBM
traffic is 8 KB of boxes in and K floats out per image instead of K² floats.

The fixpoint itself is identical math to ops.nms._nms_fixpoint (same divide,
same eps, same sweep rule), so the keep mask is bit-identical to the XLA
path — tested in tests/test_pallas_kernels.py against both the fixpoint and
the host oracle.

Layout notes (why boxes are passed twice): the kernel needs box coordinates
both as columns (K, 1) and rows (1, K) to broadcast the K×K pairwise
intersection. Slicing lanes from a (K, 4) block gives the columns and
slicing sublanes from the (4, K) transpose gives the rows, so the host
passes both views (8 KB/image — free) and the kernel never transposes.

The per-sweep kept-row -> kept-column turn uses a diagonal-mask reduction
(any(eye & kept_row, axis=1)) instead of a transpose: K×K boolean ops on the
VPU beat a sublane<->lane relayout and keep Mosaic happy.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fixpoint_sweeps(overlapf, valid_row, k: int):
    """Shared greedy-fixpoint loop over a precomputed (K, K) overlap matrix.

    overlapf: f32 0/1, [i, j] = "i outranks j and suppresses it".
    valid_row: (1, K) f32 0/1. Returns the (1, K) f32 keep mask.
    The kept mask is carried as f32 — Mosaic cannot yield i1 vectors from
    scf loops (vector<8x128xi1> fails to legalize).
    """
    row = lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = lax.broadcasted_iota(jnp.int32, (k, k), 1)
    eyef = (row == col).astype(jnp.float32)

    def cond(carry):
        _, changed, it = carry
        return changed & (it < k)

    def body(carry):
        kept_row, _, it = carry
        kept_col = jnp.max(eyef * kept_row, axis=1, keepdims=True)  # (K, 1) == kept_row.T
        suppressed = jnp.max(overlapf * kept_col, axis=0, keepdims=True)  # (1, K)
        new_kept = valid_row * (1.0 - suppressed)
        return new_kept, jnp.any(new_kept != kept_row), it + 1

    kept, _, _ = lax.while_loop(cond, body, (valid_row, jnp.bool_(True), jnp.int32(0)))
    return kept


def _fused_kernel(bc_ref, bt_ref, valid_ref, thr_ref, kept_ref, *, k: int):
    thr = thr_ref[0]
    bc = bc_ref[:, :]  # (K, 4) f32 — the None batch dim is dropped from the block
    bt = bt_ref[:, :]  # (4, K) f32
    x1c, y1c, x2c, y2c = bc[:, 0:1], bc[:, 1:2], bc[:, 2:3], bc[:, 3:4]
    x1r, y1r, x2r, y2r = bt[0:1, :], bt[1:2, :], bt[2:3, :], bt[3:4, :]
    iw = jnp.maximum(jnp.minimum(x2c, x2r) - jnp.maximum(x1c, x1r), 0.0)
    ih = jnp.maximum(jnp.minimum(y2c, y2r) - jnp.maximum(y1c, y1r), 0.0)
    inter = iw * ih
    # same area/eps/divide as ops.iou.box_iou_matrix -> bit-identical keep mask
    area_c = jnp.maximum(x2c - x1c, 0.0) * jnp.maximum(y2c - y1c, 0.0)
    area_r = jnp.maximum(x2r - x1r, 0.0) * jnp.maximum(y2r - y1r, 0.0)
    iou = inter / (area_c + area_r - inter + 1e-7)
    row = lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = lax.broadcasted_iota(jnp.int32, (k, k), 1)
    overlapf = ((iou > thr) & (row < col)).astype(jnp.float32)  # [i, j]: i suppresses j
    valid_row = (valid_ref[:, :] > 0.0).astype(jnp.float32)  # (1, K)
    kept_ref[:, :] = _fixpoint_sweeps(overlapf, valid_row, k)


@partial(jax.jit, static_argnames=("interpret",))
def nms_keep_pallas(
    cboxes: jnp.ndarray,  # (B, K, 4) f32, score-sorted (class-offset applied)
    valid: jnp.ndarray,  # (B, K) bool
    iou_thres,  # traced scalar
    interpret: bool = False,
) -> jnp.ndarray:
    """Greedy-NMS keep mask (B, K) bool; fixpoint math of ops.nms._nms_fixpoint."""
    b, k, _ = cboxes.shape
    bc = cboxes.astype(jnp.float32)
    bt = jnp.swapaxes(bc, 1, 2)  # (B, 4, K)
    vf = valid.astype(jnp.float32)[:, None, :]  # (B, 1, K)
    thr = jnp.broadcast_to(jnp.asarray(iou_thres, jnp.float32), (1,))
    kept = pl.pallas_call(
        partial(_fused_kernel, k=k),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, k, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 4, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((None, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
        interpret=interpret,
    )(bc, bt, vf, thr)
    return kept[:, 0, :] > 0.5


def _fused_rotated_kernel(pc_ref, pt_ref, valid_ref, thr_ref, kept_ref, *, k: int):
    """probIoU analog of _fused_kernel for oriented boxes.

    The per-candidate Gaussian terms (x, y, a, b, c) are precomputed outside
    (ops.rotated._cov) and passed in both (K, 5) and (5, K) views; the
    pairwise Bhattacharyya/Hellinger probIoU (identical math to
    ops.rotated.probiou_matrix, same eps/clamps) is evaluated on (K, K)
    broadcasts in VMEM.
    """
    thr = thr_ref[0]
    eps = 1e-7
    pc = pc_ref[:, :]  # (K, 5): x, y, a, b, c columns
    pt = pt_ref[:, :]  # (5, K)
    xc, yc, ac, bc, cc = pc[:, 0:1], pc[:, 1:2], pc[:, 2:3], pc[:, 3:4], pc[:, 4:5]
    xr, yr, ar, br, cr = pt[0:1, :], pt[1:2, :], pt[2:3, :], pt[3:4, :], pt[4:5, :]
    dx = xc - xr
    dy = yc - yr
    sa = ac + ar
    sb = bc + br
    sc = cc + cr
    denom = sa * sb - sc * sc + eps
    t1 = (sb * dx * dx + sa * dy * dy - 2.0 * sc * dx * dy) / denom * 0.25
    det1 = jnp.maximum(ac * bc - cc * cc, eps)
    det2 = jnp.maximum(ar * br - cr * cr, eps)
    t3 = jnp.log(denom / (4.0 * jnp.sqrt(det1 * det2) + eps) + eps) * 0.5
    bd = jnp.clip(t1 + t3, eps, 100.0)
    iou = 1.0 - jnp.sqrt(jnp.maximum(1.0 - jnp.exp(-bd), eps))
    row = lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = lax.broadcasted_iota(jnp.int32, (k, k), 1)
    overlapf = ((iou > thr) & (row < col)).astype(jnp.float32)
    valid_row = (valid_ref[:, :] > 0.0).astype(jnp.float32)
    kept_ref[:, :] = _fixpoint_sweeps(overlapf, valid_row, k)


@partial(jax.jit, static_argnames=("interpret",))
def rotated_nms_keep_pallas(
    gauss: jnp.ndarray,  # (B, K, 5) f32: x, y + covariance a, b, c, score-sorted
    valid: jnp.ndarray,  # (B, K) bool
    iou_thres,  # traced scalar
    interpret: bool = False,
) -> jnp.ndarray:
    """Greedy probIoU-NMS keep mask (B, K) bool (ops.rotated fixpoint math)."""
    b, k, _ = gauss.shape
    pc = gauss.astype(jnp.float32)
    pt = jnp.swapaxes(pc, 1, 2)  # (B, 5, K)
    vf = valid.astype(jnp.float32)[:, None, :]
    thr = jnp.broadcast_to(jnp.asarray(iou_thres, jnp.float32), (1,))
    kept = pl.pallas_call(
        partial(_fused_rotated_kernel, k=k),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, k, 5), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 5, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((None, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
        interpret=interpret,
    )(pc, pt, vf, thr)
    return kept[:, 0, :] > 0.5
