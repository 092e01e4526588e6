"""Functional NN primitives, NHWC layout (TPU-native).

These replace the torch/cuDNN kernels the reference inherits through
ultralytics (reference core/model.py:118-133 delegates every forward pass to
`ultralytics.YOLO`). Everything here is pure-functional: parameters are plain
pytrees (dicts of jnp arrays), batch-norm running statistics live in a
separate `state` tree so the forward pass stays side-effect free and jittable.

Layout conventions:
  activations : (N, H, W, C)      -- NHWC, the layout XLA:TPU prefers
  conv kernels: (KH, KW, Cin/g, Cout)  -- HWIO
  padding     : explicit k//2 symmetric pads (matches torch Conv2d autopad
                semantics exactly; XLA 'SAME' differs for stride 2)
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# BatchNorm hyperparameters used throughout the YOLO11 family
# (ultralytics Conv uses BatchNorm2d(eps=1e-3, momentum=0.03)).
BN_EPS = 1e-3
BN_MOMENTUM = 0.03

Params = Dict[str, Any]
State = Dict[str, Any]


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


def autopad(k: int, d: int = 1) -> int:
    """Symmetric padding that keeps spatial dims for stride 1 (torch-style)."""
    if d > 1:
        k = d * (k - 1) + 1
    return k // 2


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    *,
    stride: int = 1,
    groups: int = 1,
    dilation: int = 1,
    padding: Optional[int] = None,
) -> jnp.ndarray:
    """2-D convolution, NHWC x HWIO -> NHWC with explicit torch-style padding."""
    k = w.shape[0]
    p = autopad(k, dilation) if padding is None else padding
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((p, p), (p, p)),
        rhs_dilation=(dilation, dilation),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def max_pool(x: jnp.ndarray, k: int, stride: int = 1, padding: Optional[int] = None) -> jnp.ndarray:
    import numpy as _np

    p = k // 2 if padding is None else padding
    if jnp.issubdtype(x.dtype, jnp.floating):
        neg_inf = -float("inf")  # weak-typed literal matches any float dtype
    else:
        # numpy scalar keeps the integer dtype (int8 maxpool on the quant path)
        neg_inf = _np.asarray(_np.iinfo(_np.dtype(x.dtype)).min, _np.dtype(x.dtype))[()]
    return lax.reduce_window(
        x,
        neg_inf,
        lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (p, p), (p, p), (0, 0)),
    )


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample (exact integer-factor semantics)."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def stem_conv_s2d(
    params: Params,
    state: Optional[State],
    x: jnp.ndarray,
    *,
    act: bool = True,
    training: bool = False,
) -> Tuple[jnp.ndarray, Optional[State]]:
    """EXACT space-to-depth rewrite of a k=3 stride=2 pad=1 convolution.

    The stem conv (3->C at full resolution) runs at ~3% MXU utilization: the
    contraction dim is 3*9=27 against the 128-wide systolic array. Rewriting
    x -> space_to_depth(2) turns it into a k=2 stride=1 conv with contraction
    12*4=48 and a quarter the spatial positions. Outputs are bit-identical;
    on v5e XLA's own conv lowering already performs comparably, so this path
    is opt-in (YOLO_TPU_S2D=1) — kept as a documented, tested alternative for
    hardware/compiler combinations where the stem does bind.

    Derivation: y(i,j) reads input rows {2i-1, 2i, 2i+1}; in block space these
    are (block i-1, offset 1) and (block i, offsets 0/1), i.e. a 2x2 window
    over blocks with one always-zero tap: w2[di,dj,(dy,dx,c),o] =
    w[2di+dy-1, 2dj+dx-1, c, o] (zero where the index is -1), applied with
    padding (1,0)x(1,0).
    """
    b, h, w_dim, c = x.shape
    assert h % 2 == 0 and w_dim % 2 == 0, "stem s2d path needs even spatial dims"
    wk = params["w"]  # (3, 3, C_in, C_out)
    o = wk.shape[-1]
    # build the (2, 2, 4*C_in, C_out) block kernel from the 3x3 kernel
    wp = jnp.pad(wk, ((1, 0), (1, 0), (0, 0), (0, 0)))  # index [2di+dy, 2dj+dx]
    w2 = wp.reshape(2, 2, 2, 2, c, o).transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, 4 * c, o)
    # space-to-depth(2): (B, H/2, W/2, 4*C) with (dy, dx, c) channel order
    xs = x.reshape(b, h // 2, 2, w_dim // 2, 2, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w_dim // 2, 4 * c)
    y = lax.conv_general_dilated(
        xs,
        w2.astype(xs.dtype),
        window_strides=(1, 1),
        padding=((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    new_state = state
    if "gamma" in params:
        if training:
            xf = y.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.var(xf, axis=(0, 1, 2))
            # torch updates running_var with the UNBIASED (N-1) estimate while
            # normalizing the batch with the biased one — mirror both.
            n = xf.shape[0] * xf.shape[1] * xf.shape[2]
            var_unbiased = var * (n / max(n - 1, 1))
            new_state = {
                "mean": (1 - BN_MOMENTUM) * state["mean"] + BN_MOMENTUM * mean,
                "var": (1 - BN_MOMENTUM) * state["var"] + BN_MOMENTUM * var_unbiased,
            }
        else:
            mean, var = state["mean"], state["var"]
        scale = params["gamma"].astype(jnp.float32) * lax.rsqrt(var + BN_EPS)
        bias = params["beta"].astype(jnp.float32) - mean * scale
        y = y * scale.astype(y.dtype) + bias.astype(y.dtype)
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    if act:
        y = silu(y)
    return y, new_state


def conv_transpose2x(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """2x2-stride-2 transposed conv (torch ConvTranspose2d semantics, exact).

    `w` layout: (kh, kw, Cout, Cin) — from torch's (Cin, Cout, kh, kw) via
    transpose(2, 3, 1, 0); verified bit-exact against torch.
    """
    y = lax.conv_transpose(
        x,
        w.astype(x.dtype),
        strides=(2, 2),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def adaptive_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Global average pool -> (N, C)."""
    return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# Conv + BN + act block (the workhorse of the whole YOLO family)
# ---------------------------------------------------------------------------

def init_conv_block(
    rng: jax.Array,
    c_in: int,
    c_out: int,
    k: int = 1,
    *,
    groups: int = 1,
    bn: bool = True,
    bias: bool = False,
    dtype=jnp.float32,
) -> Tuple[Params, State]:
    """Kaiming-uniform conv init + identity BN, mirroring torch defaults."""
    fan_in = c_in // groups * k * k
    bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
    w = jax.random.uniform(rng, (k, k, c_in // groups, c_out), dtype, -bound, bound)
    params: Params = {"w": w}
    state: State = {}
    if bn:
        params["gamma"] = jnp.ones((c_out,), dtype)
        params["beta"] = jnp.zeros((c_out,), dtype)
        state["mean"] = jnp.zeros((c_out,), jnp.float32)
        state["var"] = jnp.ones((c_out,), jnp.float32)
    if bias:
        params["b"] = jnp.zeros((c_out,), dtype)
    return params, state


def conv_block(
    params: Params,
    state: Optional[State],
    x: jnp.ndarray,
    *,
    stride: int = 1,
    groups: int = 1,
    dilation: int = 1,
    act: bool = True,
    training: bool = False,
) -> Tuple[jnp.ndarray, Optional[State]]:
    """Conv -> BN -> SiLU. Returns (y, new_state).

    If the params were produced by `fold_batchnorm` the BN factors are already
    merged into `w`/`b` and this reduces to conv+bias+act (the deploy path).
    Int8-quantized nodes (key 'w_q', see nn.quantize) run the int8 MXU path;
    an active QuantContext switches observe/static/static8/fake behavior.
    In "static8" mode quantized convs consume/produce QAct (int8 residency).
    """
    from yolo_infer_tpu.nn import quantize as Q

    ctx = Q.current_context()
    if "w_q" in params:  # int8 deploy path
        if dilation != 1:
            raise NotImplementedError("int8 conv path does not support dilation")
        if ctx is not None and ctx.mode == "observe8":
            # calibration pass over the quantized tree: run the conv in float
            # with dequantized weights and record (input, output) absmax —
            # same tree, same order as the static8 consumer.
            x_fp = Q.as_float(x, jnp.float32)
            w_fp = Q.dequantize_weights(params["w_q"], params["w_scale"], x_fp.dtype)
            y = conv2d(x_fp, w_fp, stride=stride, groups=groups)
            if "b" in params:
                y = y + params["b"].astype(y.dtype)
            if act:
                y = silu(y)
            ctx.observe_pair(x_fp, y)
            return y, state
        if ctx is not None and ctx.mode == "static8":
            idx = ctx.index
            sx, sy = ctx.next_scale_pair()
            ci = params["w_q"].shape[2] * groups
            co = params["w_q"].shape[3]
            # eligibility is shape-aware (trace-time): C>=128 convs always
            # quantize; C=64 convs quantize only when this conv's activation
            # volume rows = N*H*W clears int8_c64_min_rows — the regime where
            # the 1-byte HBM residency pays off (VERDICT r3 #9: the old rule
            # keyed on raw batch>=64 and was calibrated only at imgsz 640, so
            # at 1280 int8 could silently lose). Rows generalizes it: at 640
            # the C=64 convs live at the 80x80 level, so batch 64 = 409.6k
            # rows (old rule fired) and batch 32 = 204.8k (didn't).
            # Thresholds beyond any real channel count (>1024) are explicit
            # exempt-everything requests (the weight-only int8 knob) and must
            # NOT be relaxed by the volume rule.
            thresh = ctx.int8_min_channels
            rows = x.shape[0] * x.shape[1] * x.shape[2]
            if rows >= ctx.int8_c64_min_rows and thresh <= 1024:
                thresh = min(thresh, 64)
            exempt = min(ci, co) < thresh
            if exempt or (ctx.float_convs is not None and idx in ctx.float_convs):
                # exempted conv: run dequantized-fp (first-layer exemption)
                x_fp = Q.as_float(x, jnp.bfloat16)
                w_fp = Q.dequantize_weights(params["w_q"], params["w_scale"], x_fp.dtype)
                y = conv2d(x_fp, w_fp, stride=stride, groups=groups)
                if "b" in params:
                    y = y + params["b"].astype(y.dtype)
                if act:
                    y = silu(y)
                return y, state
            if isinstance(x, Q.QAct):
                xq, sx = x.q, x.s  # direct int8 edge: no extra rounding
            else:
                xq = Q.quantize_act(x, sx).q
            k = params["w_q"].shape[0]
            p = k // 2
            y = lax.conv_general_dilated(
                xq,
                params["w_q"],
                window_strides=(stride, stride),
                padding=((p, p), (p, p)),
                feature_group_count=groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            # fused epilogue: rescale + bias + SiLU + requant, all elementwise.
            # The int32->scale multiply happens in f32 (int32 magnitudes
            # overflow bf16 mantissa); the rest runs in bf16 by default
            # (measured: f32 epilogue costs ~20% e2e at b128 on v5e).
            ed = ctx.epilogue_dtype or jnp.bfloat16
            y = (y.astype(jnp.float32) * (sx * params["w_scale"])).astype(ed)
            if "b" in params:
                y = y + params["b"].astype(ed)
            if act:
                y = silu(y)
            # requant by scalar-reciprocal MULTIPLY (divide is ~10x the VPU
            # cost of multiply and this runs over the full activation tensor;
            # matches the Pallas kernel's syinv convention,
            # ops/pallas/int8_conv.py:40-53 — at most a 1-ULP rounding-edge
            # difference, covered by the fidelity rows)
            syinv = (1.0 / sy.astype(jnp.float32)).astype(ed)
            return Q.QAct(jnp.clip(jnp.round(y * syinv), -127, 127).astype(jnp.int8), sy), state
        # dynamic (calibration-free) / legacy per-conv-static path: fp in/out
        x = Q.as_float(x, getattr(x, "dtype", jnp.float32) if not isinstance(x, Q.QAct) else jnp.bfloat16)
        x_scale = ctx.next_scale() if ctx is not None and ctx.mode == "static" else None
        y = Q.quantized_conv2d(
            x, params["w_q"], params["w_scale"], stride=stride, groups=groups, x_scale=x_scale
        ).astype(x.dtype)
        if "b" in params:
            y = y + params["b"].astype(y.dtype)
        if act:
            y = silu(y)
        return y, state
    if isinstance(x, Q.QAct):  # float-weight node fed by an int8 edge
        w_dt = params["w"].dtype
        x = x.dequant(w_dt if jnp.issubdtype(w_dt, jnp.floating) else jnp.float32)
    if ctx is not None and ctx.mode == "observe":
        ctx.observe(x)
    w = params["w"]
    if ctx is not None and ctx.mode == "fake" and w.ndim == 4:
        w_scale = jnp.maximum(jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2)), 1e-12) / 127.0
        w = Q.fake_quantize(w.astype(jnp.float32), w_scale).astype(w.dtype)
        x = Q.fake_quantize(
            x.astype(jnp.float32),
            ctx.next_scale() if ctx.act_scales is not None else Q.dynamic_act_scale(x),
        ).astype(x.dtype)
    y = conv2d(x, w, stride=stride, groups=groups, dilation=dilation)
    new_state = state
    if "gamma" in params:  # unfused batch norm
        if training:
            xf = y.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.var(xf, axis=(0, 1, 2))
            n = xf.shape[0] * xf.shape[1] * xf.shape[2]
            var_unbiased = var * (n / max(n - 1, 1))  # torch running_var rule
            new_state = {
                "mean": (1 - BN_MOMENTUM) * state["mean"] + BN_MOMENTUM * mean,
                "var": (1 - BN_MOMENTUM) * state["var"] + BN_MOMENTUM * var_unbiased,
            }
        else:
            mean = state["mean"]
            var = state["var"]
        scale = params["gamma"].astype(jnp.float32) * lax.rsqrt(var + BN_EPS)
        bias = params["beta"].astype(jnp.float32) - mean * scale
        y = y * scale.astype(y.dtype) + bias.astype(y.dtype)
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    if act:
        y = silu(y)
    return y, new_state


def fold_batchnorm(params: Params, state: State) -> Params:
    """Fold BN running stats into conv weight/bias for inference.

    w' = w * gamma/sqrt(var+eps), b' = beta - mean*gamma/sqrt(var+eps).
    This is the TPU-native analog of the conv-bn fusion the reference gets
    implicitly from ultralytics' `fuse()` at predict time.
    """
    if "gamma" not in params:
        return dict(params)
    scale = params["gamma"].astype(jnp.float32) * lax.rsqrt(state["var"] + BN_EPS)
    w = params["w"].astype(jnp.float32) * scale  # broadcast over O (last axis of HWIO)
    b = params["beta"].astype(jnp.float32) - state["mean"] * scale
    out = {"w": w.astype(params["w"].dtype), "b": b.astype(params["w"].dtype)}
    return out


def init_dense(rng: jax.Array, c_in: int, c_out: int, dtype=jnp.float32) -> Params:
    bound = math.sqrt(1.0 / c_in)
    wkey, bkey = jax.random.split(rng)
    return {
        "w": jax.random.uniform(wkey, (c_in, c_out), dtype, -bound, bound),
        "b": jax.random.uniform(bkey, (c_out,), dtype, -bound, bound),
    }


def dense(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.dot(x, params["w"].astype(x.dtype), preferred_element_type=x.dtype) + params["b"].astype(x.dtype)
