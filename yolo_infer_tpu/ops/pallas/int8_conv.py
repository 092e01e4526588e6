"""Fused int8 3x3 convolution Pallas kernel (SURVEY.md §7 hard-part 3).

One kernel does what the XLA static8 path spreads over several ops:
int8 input tile (with halo) lives in VMEM; the 3x3 conv is NINE shifted
(TH*W, Cin) x (Cin, Cout) MXU dots accumulated in int32; the epilogue
(per-channel rescale + bias + SiLU + requantize) runs in-register and the
only HBM traffic is int8 in / int8 out.

MEASURED OUTCOME (v5e, tools/bench_pallas_conv.py, chained in-jit timing):
this kernel does NOT beat XLA's native s8 convolutions — XLA reaches
142-169 TFLOP/s on the C>=128 shapes (1.12-1.32x its own bf16) while this
single-level tiling peaks at ~94. XLA's int8 conv lowering is already
near-optimal where int8 wins at all; the per-shape sweep run with this
benchmark is what calibrated the production eligibility rule instead
(QuantContext.int8_min_channels in nn/quantize.py: int8 collapses to 0.34x
bf16 at C=32 with large batch*spatial, so those convs run dequantized).
Kept as a correctness-tested negative result + the measurement harness.

Scope: k=3, stride=1, groups=1. The input arrives pre-padded by 1 (zero pad
== int8 zero-point 0, exact). Grid is over batch: each program owns one
image's padded feature map; Pallas double-buffers blocks automatically.

Numerics: identical rounding to the XLA static8 path (round-half-even via
jnp.round, clip to [-127, 127]) — tested against it in
tests/test_pallas_int8.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, scale_ref, bias_ref, syinv_ref, o_ref, *, H, W, Ci, Co, TH, act):
    syinv = syinv_ref[0, 0]
    for ht in range(H // TH):
        acc = jnp.zeros((TH * W, Co), jnp.int32)
        for dy in range(3):
            for dx in range(3):
                xs = x_ref[0, ht * TH + dy : ht * TH + dy + TH, dx : dx + W, :]
                a = xs.reshape(TH * W, Ci)
                wt = w_ref[(dy * 3 + dx) * Ci : (dy * 3 + dx + 1) * Ci, :]
                acc = acc + jnp.dot(a, wt, preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * scale_ref[0, :]
        y = y + bias_ref[0, :]
        if act:
            y = y * jax.nn.sigmoid(y)
        q = jnp.clip(jnp.round(y * syinv), -127, 127).astype(jnp.int8)
        o_ref[0, ht * TH : (ht + 1) * TH, :, :] = q.reshape(TH, W, Co)


def _pick_th(h: int) -> int:
    for th in (8, 4, 2, 1):
        if h % th == 0:
            return th
    return 1


def int8_conv3x3_fused(
    x_q: jnp.ndarray,  # (B, H, W, Ci) int8 (NOT padded)
    w_q: jnp.ndarray,  # (3, 3, Ci, Co) int8
    scale: jnp.ndarray,  # (Co,) f32 = sx * w_scale
    bias: Optional[jnp.ndarray],  # (Co,) f32 or None
    sy: jnp.ndarray,  # scalar f32 output scale
    *,
    act: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (B, H, W, Co) int8 quantized with scale `sy`."""
    B, H, W, Ci = x_q.shape
    Co = w_q.shape[-1]
    TH = _pick_th(H)
    xp = jnp.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wr = w_q.reshape(9 * Ci, Co)
    scale2 = scale.reshape(1, Co).astype(jnp.float32)
    bias2 = (bias if bias is not None else jnp.zeros((Co,), jnp.float32)).reshape(1, Co).astype(jnp.float32)
    syinv = (1.0 / sy.astype(jnp.float32)).reshape(1, 1)

    kern = functools.partial(_kernel, H=H, W=W, Ci=Ci, Co=Co, TH=TH, act=act)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H + 2, W + 2, Ci), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * Ci, Co), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Co), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Co), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, Co), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Co), jnp.int8),
        interpret=interpret,
    )(xp, wr, scale2, bias2, syinv)


def eligible(h: int, w: int, ci: int, co: int, k: int, stride: int, groups: int) -> bool:
    """Shapes this kernel handles AND where staying in VMEM is feasible."""
    if k != 3 or stride != 1 or groups != 1:
        return False
    vmem = (h + 2) * (w + 2) * ci + 9 * ci * co + 2 * h * w * co + 4 * 8 * w * co
    return vmem < 8 * 1024 * 1024 and h >= 2 and ci >= 32 and co >= 32


def xla_reference(x_q, w_q, scale, bias, sy, act=True):
    """The XLA static8 equivalent (for tests/benchmarks)."""
    from jax import lax

    y = lax.conv_general_dilated(
        x_q, w_q, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * scale
    if bias is not None:
        y = y + bias
    if act:
        y = y * jax.nn.sigmoid(y)
    return jnp.clip(jnp.round(y / sy), -127, 127).astype(jnp.int8)
