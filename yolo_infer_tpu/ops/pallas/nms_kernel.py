"""Pallas TPU kernel: sequential greedy NMS suppression in one kernel.

Keeps the whole (K, K) IoU matrix and the kept mask VMEM-resident and runs
the exact sequential greedy scan as one fori_loop. K=1024 -> 4 MB IoU block,
comfortably within the ~16 MB VMEM budget.

Grid: one program per batch element. Scalar dynamic reads are avoided (TPU
lane-indexing constraint) by reducing `kept * onehot(i)` instead of indexing.

Measured on v5e-1 (B=128, K=512): bit-identical to the XLA fixpoint
(ops.nms._nms_fixpoint) but ~4x slower — the K serial loop iterations of
small VPU work lose to the fixpoint's handful of full-matrix sweeps, whose
sweep count is the longest suppression chain (usually < 10). The fixpoint is
therefore the production path; this kernel stands as the exactness oracle
and the fallback for adversarial inputs with pathological chain lengths
(where the fixpoint would need many sweeps but this kernel stays O(K)).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _greedy_kernel(iou_ref, valid_ref, thr_ref, kept_ref):
    k = iou_ref.shape[0]
    thr = thr_ref[0, 0]
    kept_ref[:, :] = valid_ref[:, :]
    col = lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, _):
        row = iou_ref[pl.ds(i, 1), :]  # (1, K)
        # kept[i] without dynamic lane indexing: sum(kept * onehot(i))
        keep_i = jnp.sum(jnp.where(col == i, kept_ref[:, :], 0.0))
        suppress = (row > thr) & (col > i) & (keep_i > 0.0)
        kept_ref[:, :] = jnp.where(suppress, 0.0, kept_ref[:, :])
        return 0

    lax.fori_loop(0, k, body, 0)


@partial(jax.jit, static_argnames=("interpret",))
def greedy_nms_pallas(
    iou: jnp.ndarray,  # (B, K, K) f32 pairwise IoU of score-sorted candidates
    valid: jnp.ndarray,  # (B, K) bool
    iou_thres,  # scalar
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact sequential greedy NMS keep-mask, one pallas program per image."""
    b, k, _ = iou.shape
    thr = jnp.broadcast_to(jnp.asarray(iou_thres, jnp.float32), (1, 1))
    kept = pl.pallas_call(
        _greedy_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, k, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((None, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
        interpret=interpret,
    )(iou.astype(jnp.float32), valid.astype(jnp.float32)[:, None, :], thr)
    return kept[:, 0, :] > 0.5
