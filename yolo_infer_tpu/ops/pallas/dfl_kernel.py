"""Pallas TPU kernel: fused DFL softmax-expectation decode.

(B, A, 4*reg_max) distribution logits -> (B, A, 4) expected distances, with
the softmax and the bin-expectation dot fused in VMEM (one HBM read, one HBM
write). The jnp reference (ops.decode.dfl_expectation) round-trips the
softmax through HBM when XLA declines to fuse the reshape chain.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dfl_kernel(x_ref, out_ref, *, reg_max: int):
    x = x_ref[0].astype(jnp.float32)  # (TA, 4*reg_max)
    ta = x.shape[0]
    x4 = x.reshape(ta * 4, reg_max)
    m = jnp.max(x4, axis=-1, keepdims=True)
    e = jnp.exp(x4 - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    bins = lax.broadcasted_iota(jnp.float32, (1, reg_max), 1)
    expect = jnp.sum(probs * bins, axis=-1)  # (TA*4,)
    out_ref[0] = expect.reshape(ta, 4)


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
