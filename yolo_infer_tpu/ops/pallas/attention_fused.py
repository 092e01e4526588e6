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


def _attn_qkv_kernel(qkv_ref, out_ref, *, heads: int, kd: int, hd: int, scale: float):
    """Whole-attention step for one batch row: every head VMEM-resident.

    `qkv_ref` is the raw qkv-conv output slab (N, heads*(2*kd+hd)) in its
    natural channel order [h0: q|k|v][h1: q|k|v]... — no host-side transpose
    or split. The per-head channel stride 2*kd+hd is 128 for every YOLO11
    size (kd = hd//2, hd = 64), so head slices stay lane-aligned.
    """
    slab = qkv_ref[:, :]  # (N, heads*(2*kd+hd)) bf16
    step = 2 * kd + hd
    outs = []
    for h in range(heads):
        base = h * step
        q = slab[:, base : base + kd]
        k = slab[:, base + kd : base + 2 * kd]
        v = slab[:, base + 2 * kd : base + step]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (N, N) f32
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(slab.dtype)
        o = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        outs.append(o.astype(out_ref.dtype))
    out_ref[:, :] = outs[0] if heads == 1 else jnp.concatenate(outs, axis=-1)


@partial(jax.jit, static_argnames=("heads", "kd", "hd", "interpret"))
def attention_qkv_fused_pallas(
    qkv: jnp.ndarray,  # (B, N, heads*(2*kd+hd)) bf16 — raw qkv-conv output
    heads: int,
    kd: int,
    hd: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused multi-head softmax(q k^T / sqrt(kd)) v on the UNPACKED qkv slab.

    Replaces the XLA path's entire pack -> batched-dot -> softmax -> unpack
    chain: the b32 device trace showed the (B, N, h, d) head-major packing
    fusion alone at 1.47 ms and the f32 softmax chain at ~1.6 ms — together
    ~3 ms of an 11-14 ms n/b32 e2e step for 0.65 GFLOP of attention math
    (tools/trace_ops.py, 2026-08-19). Grid is over batch; heads unroll inside
    the kernel so the score matrix never leaves VMEM and HBM sees only the
    qkv slab in and the (B, N, heads*hd) output out, both in their natural
    conv layouts. Returns (B, N, heads*hd)."""
    b, n, d = qkv.shape
    assert d == heads * (2 * kd + hd), (d, heads, kd, hd)
    scale = kd ** -0.5
    return pl.pallas_call(
        partial(_attn_qkv_kernel, heads=heads, kd=kd, hd=hd, scale=scale),
        grid=(b,),
        in_specs=[pl.BlockSpec((None, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, n, heads * hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, heads * hd), qkv.dtype),
        interpret=interpret,
    )(qkv)


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
