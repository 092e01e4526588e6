"""Fused C2PSA attention kernel (TPU Pallas).

The production XLA path (models/blocks.py apply_attention) materializes the
(B*heads, N, N) f32 attention matrix in HBM three times over (qk write,
softmax read/write, av read) — ~500 MB of traffic at n-scale b128 for ~13
GFLOPs of matmul. Here the whole per-(batch, head) attention — qk product,
f32 softmax, av product — runs VMEM-resident: HBM sees only qkv in and out.
N=400 (20x20 P5 grid) at head dims (key 32, value 64) fits easily: the f32
score matrix is 400x400x4 = 640 KB.

Numerics match the XLA path operation-for-operation: bf16 matmuls with f32
accumulation, f32 softmax, bf16 cast before the value product.

Replaces nothing in the reference (attention lives inside ultralytics'
C2PSA — reference consumes it via the model import, SURVEY.md §2b); this is
the TPU-native recast of that inherited capability's hot loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(qkv_ref, out_ref, *, n: int, kd: int, hd: int, scale: float):
    qkv = qkv_ref[:, :]  # (N, 2*kd+hd) bf16
    q = qkv[:, :kd]
    k = qkv[:, kd : 2 * kd]
    v = qkv[:, 2 * kd :]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (N, N) f32
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(qkv.dtype)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    out_ref[:, :] = o.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("kd", "hd", "interpret"))
def attention_fused_pallas(
    qkv: jnp.ndarray,  # (G, N, 2*kd+hd) bf16, G = batch*heads
    kd: int,
    hd: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-(batch, head) softmax(q k^T / sqrt(kd)) v. Returns (G, N, hd)."""
    g, n, d = qkv.shape
    assert d == 2 * kd + hd, (d, kd, hd)
    scale = kd ** -0.5
    return pl.pallas_call(
        partial(_attn_kernel, n=n, kd=kd, hd=hd, scale=scale),
        grid=(g,),
        in_specs=[pl.BlockSpec((None, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, n, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, n, hd), qkv.dtype),
        interpret=interpret,
    )(qkv)
