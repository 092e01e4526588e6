"""Anchor-row selection for serving tails (pose keypoints, segment coefs).

After NMS the pose/segment heads pull max_det (~300) anchor rows out of the
full anchor grid ((B, 8400, 51) for pose at 640). ``jnp.take_along_axis``
lowers that to a TPU row gather whose slice width (51 or 32 elements) is
well under one 128-lane register — the scalar-gather regime that cost the
training losses 10-20x before the one-hot rewrite (CLAUDE.md round-3 train
notes). The alternative formulation contracts a (B, K, A) one-hot with the
grid on the MXU: one matmul, HBM-linear in the grid size.

Both are exact (a one-hot row sum touches exactly one nonzero product, so
any accumulation precision reproduces the row bit-for-bit; tests pin this).
``YOLO_TPU_ROWSEL`` or the ``impl`` arg picks: 'gather' | 'onehot'.
Default: measured per tools/bench_rowsel.py (v5e 2026-08-19) — see
_DEFAULT below.

Reference semantic: ultralytics keeps per-detection tensors by boolean
indexing on GPU (reference inherits Results slicing); here shapes are
static so selection is an indexed read of a fixed row budget.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# v5e A/B through the full predict program (tools/bench_rowsel.py,
# 2026-08-19, n/b32 @640, 30-run sustained): pose 16.00 -> 15.60 ms,
# segment 37.83 -> 37.44. onehot also unblocked pose chunking (the gather
# serialized the tail): pose chunk16-unroll 12.14 ms vs 17.15 round-3 base.
# On non-TPU backends the (B, K, A) contraction is raw extra FLOPs with no
# scalar-gather problem to dodge — gather there.
def _default_impl() -> str:
    from yolo_infer_tpu.ops.nms import _on_tpu

    return "onehot" if _on_tpu() else "gather"


def select_anchor_rows(x: jnp.ndarray, idx: jnp.ndarray, impl: str | None = None) -> jnp.ndarray:
    """Rows ``x[b, idx[b, k], :]`` as (B, K, D).

    x: (B, A, D) per-batch grid, or (A, D) shared across the batch
    (anchor-point / stride tables). idx: (B, K) int32.
    """
    impl = impl or os.environ.get("YOLO_TPU_ROWSEL", "") or _default_impl()
    b, k = idx.shape
    if x.ndim == 2:
        a, d = x.shape
        if impl == "onehot":
            oh = (idx[..., None] == jnp.arange(a, dtype=idx.dtype)).astype(x.dtype)
            return jnp.einsum("bka,ad->bkd", oh, x, precision=jax.lax.Precision.HIGHEST)
        return jnp.take_along_axis(jnp.broadcast_to(x[None], (b, a, d)), idx[..., None], axis=1)
    _, a, d = x.shape
    if impl == "onehot":
        oh = (idx[..., None] == jnp.arange(a, dtype=idx.dtype)).astype(x.dtype)
        return jnp.einsum("bka,bad->bkd", oh, x, precision=jax.lax.Precision.HIGHEST)
    return jnp.take_along_axis(x, idx[..., None], axis=1)
