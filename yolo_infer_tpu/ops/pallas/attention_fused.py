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


def pick_q_rows(n: int, d_in: int, d_out: int, budget: int = 12 * 2**20):
    """Largest query-row block whose kernel stack fits scoped VMEM, or None.

    The fused kernel's per-grid-step VMEM is dominated by the f32 score
    block (q_rows x N x 4) plus its bf16 softmax copy (x2) and the
    double-buffered slab/out pipeline blocks. The 16 MB scoped-vmem limit
    is real: the whole-row kernel compiled at N=1600/d_in=256 (yolo11n
    @1280) but OOM'd at 16.48 M with d_in=512 (yolo11s/m @1280, measured
    2026-08-19). The 12 MB budget on a deliberately conservative estimate
    (~1.4x the observed allocation at the OOM shape) keeps every shape
    well clear of that cliff. Returns the largest divisor of N (>= 8, the
    f32 sublane tile) whose block fits, so any grid-aligned N tiles —
    N=3600 (imgsz 1920) lands on 180-row blocks, not a fallback.
    """
    def est(qr: int) -> int:
        return qr * n * 6 + 4 * n * d_in + 4 * qr * (d_in + d_out)

    if est(n) <= budget:
        return n
    best = None
    for qr in range(8, n):
        if n % qr == 0 and est(qr) <= budget:
            best = qr
    return best


def _attn_qkv_kernel_rows(kv_ref, q_ref, out_ref, *, heads: int, kd: int, hd: int, scale: float):
    """Query-row-tiled attention: this grid step owns q rows [j*R, (j+1)*R).

    k/v come from the full slab (resident across the row dimension of the
    grid — its index map is constant in j); softmax rows are independent,
    so tiling the query dimension is bit-exact vs the whole-row kernel.
    """
    slab = kv_ref[:, :]  # (N, heads*(2*kd+hd)) bf16 — k/v source
    qrows = q_ref[:, :]  # (R, heads*(2*kd+hd)) bf16 — this block's q rows
    step = 2 * kd + hd
    outs = []
    for h in range(heads):
        base = h * step
        q = qrows[:, base : base + kd]
        k = slab[:, base + kd : base + 2 * kd]
        v = slab[:, base + 2 * kd : base + step]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (R, N) f32
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(slab.dtype)
        o = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        outs.append(o.astype(out_ref.dtype))
    out_ref[:, :] = outs[0] if heads == 1 else jnp.concatenate(outs, axis=-1)


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


@partial(jax.jit, static_argnames=("heads", "kd", "hd", "interpret", "q_rows"))
def attention_qkv_fused_pallas(
    qkv: jnp.ndarray,  # (B, N, heads*(2*kd+hd)) bf16 — raw qkv-conv output
    heads: int,
    kd: int,
    hd: int,
    interpret: bool = False,
    q_rows: int | None = None,
) -> jnp.ndarray:
    """Fused multi-head softmax(q k^T / sqrt(kd)) v on the UNPACKED qkv slab.

    Replaces the XLA path's entire pack -> batched-dot -> softmax -> unpack
    chain: the b32 device trace showed the (B, N, h, d) head-major packing
    fusion alone at 1.47 ms and the f32 softmax chain at ~1.6 ms — together
    ~3 ms of an 11-14 ms n/b32 e2e step for 0.65 GFLOP of attention math
    (tools/trace_ops.py, 2026-08-19). Grid is over batch; heads unroll inside
    the kernel so the score matrix never leaves VMEM and HBM sees only the
    qkv slab in and the (B, N, heads*hd) output out, both in their natural
    conv layouts. Returns (B, N, heads*hd).

    When the whole-row score stack would blow the 16 MB scoped-VMEM limit
    (N=1600 at s/m width — imgsz 1280 whole-batch OOM'd in production,
    2026-08-19), the grid gains a query-row dimension: each step computes
    an (R, N) score block against the full resident k/v slab — bit-exact,
    bounded VMEM. `q_rows=None` auto-picks via pick_q_rows; N=400 (imgsz
    <= 640) always resolves to the original single-block program."""
    b, n, d = qkv.shape
    assert d == heads * (2 * kd + hd), (d, heads, kd, hd)
    scale = kd ** -0.5
    if q_rows is None:
        q_rows = pick_q_rows(n, d, heads * hd)
        if q_rows is None:
            raise ValueError(
                f"attention_qkv_fused_pallas: no query-row tiling fits VMEM for "
                f"(N={n}, d={d}) — use the XLA path (models/blocks._attn_impl gates this)"
            )
    if q_rows >= n:
        return pl.pallas_call(
            partial(_attn_qkv_kernel, heads=heads, kd=kd, hd=hd, scale=scale),
            grid=(b,),
            in_specs=[pl.BlockSpec((None, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((None, n, heads * hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n, heads * hd), qkv.dtype),
            interpret=interpret,
        )(qkv)
    assert n % q_rows == 0, (n, q_rows)
    return pl.pallas_call(
        partial(_attn_qkv_kernel_rows, heads=heads, kd=kd, hd=hd, scale=scale),
        grid=(b, n // q_rows),
        in_specs=[
            # full slab (k/v): index map constant in j — stays VMEM-resident
            pl.BlockSpec((None, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            # this step's q rows: a second view of the SAME input array
            pl.BlockSpec((None, q_rows, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, q_rows, heads * hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, heads * hd), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv)


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
