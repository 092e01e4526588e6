"""Pallas TPU kernel: fused DFL softmax-expectation decode.

(B, A, 4*reg_max) distribution logits -> (B, A, 4) expected distances, with
the softmax and the bin-expectation dot fused in VMEM (one HBM read, one HBM
write).

MEASURED OUTCOME (v5e-1, tools/bench_e2e_quick.py, B=128 A=8400): 11.1 ms vs
2.0 ms for the XLA formulation — 5.6x SLOWER. The reg_max=16 softmax groups
map terribly onto 128-lane VPU tiles whichever way the kernel slices them
(16-lane segments waste 7/8 of each lane tile), and the (b, a/512) grid of
~2k small programs serializes on the single TensorCore. XLA's fused
reshape-softmax wins despite its own layout waste. Kept as a
correctness-tested negative result; the production decode stays
ops.decode.dfl_expectation (see also the class-reduction negative in
tools/bench_tail_opts.py — the tail win that DID land is the fused NMS keep
kernel, ops/pallas/nms_fused.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dfl_kernel(x_ref, out_ref, *, reg_max: int):
    # Per-side lane slices instead of a (TA, 64) -> (TA*4, 16) reshape:
    # Mosaic cannot legalize lane-dim shape casts ("unsupported shape cast"),
    # and the slice form also avoids XLA's pathology here — a (B, A, 4, 16)
    # layout puts 16 values in a 128-lane tile (8x lane waste).
    x = x_ref[0].astype(jnp.float32)  # (TA, 4*reg_max)
    # integer iota + cast: Mosaic rejects float iota results
    bins = lax.broadcasted_iota(jnp.int32, (1, reg_max), 1).astype(jnp.float32)
    sides = []
    for g in range(4):
        seg = x[:, g * reg_max : (g + 1) * reg_max]  # (TA, reg_max)
        m = jnp.max(seg, axis=-1, keepdims=True)
        e = jnp.exp(seg - m)
        expect = jnp.sum(e * bins, axis=-1, keepdims=True) / jnp.sum(e, axis=-1, keepdims=True)
        sides.append(expect)
    out_ref[0] = jnp.concatenate(sides, axis=-1)  # (TA, 4)


@partial(jax.jit, static_argnames=("reg_max", "tile", "interpret"))
def dfl_decode_pallas(
    box_dist: jnp.ndarray,  # (B, A, 4*reg_max)
    reg_max: int = 16,
    tile: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    b, a, c = box_dist.shape
    assert c == 4 * reg_max
    pad = (-a) % tile
    x = jnp.pad(box_dist, ((0, 0), (0, pad), (0, 0))) if pad else box_dist
    ap = a + pad
    out = pl.pallas_call(
        partial(_dfl_kernel, reg_max=reg_max),
        grid=(b, ap // tile),
        in_specs=[pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tile, 4), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ap, 4), jnp.float32),
        interpret=interpret,
    )(x)
    return out[:, :a]
