"""YOLO11 building blocks as (init, apply) pairs of pure functions.

Each `init_*` returns `(params, state)` pytrees; each `apply_*` returns
`(y, new_state)`. `state` carries batch-norm running statistics only; in
deploy mode (after `fold_batchnorm`) state trees are empty and the applies
are stateless.

Block topology matches the YOLO11 capability spec the reference consumes via
ultralytics (SURVEY.md §7: Conv+BN+SiLU, C3k2, SPPF, C2PSA, decoupled
Detect head with DFL reg_max=16). Implementation is TPU-idiomatic: NHWC,
einsum attention, explicit pytrees.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from yolo_infer_tpu.nn.layers import (
    conv_block,
    conv2d,
    init_conv_block,
    max_pool,
    silu,
    upsample2x,
    adaptive_avg_pool,
    init_dense,
    dense,
)
from yolo_infer_tpu.nn.quantize import QAct, as_float, q_add, q_concat, q_split2, q_split_at

Params = Dict[str, Any]
State = Dict[str, Any]


def _q_maxpool(x, k: int):
    """Max-pool that stays int8 on QAct inputs (per-tensor scale is
    order-preserving, so pooling the raw int8 codes is exact)."""
    if isinstance(x, QAct):
        return QAct(max_pool(x.q, k), x.s)
    return max_pool(x, k)


def _split(rng, n):
    return list(jax.random.split(rng, n))


# ---------------------------------------------------------------------------
# Conv (+BN+SiLU)
# ---------------------------------------------------------------------------

def init_conv(rng, c1: int, c2: int, k: int = 1, *, groups: int = 1, dtype=jnp.float32):
    return init_conv_block(rng, c1, c2, k, groups=groups, dtype=dtype)


def init_dwconv(rng, c1: int, c2: int, k: int = 3, dtype=jnp.float32):
    g = math.gcd(c1, c2)
    return init_conv_block(rng, c1, c2, k, groups=g, dtype=dtype)


def apply_conv(p: Params, s: Optional[State], x, *, stride: int = 1, act: bool = True, training: bool = False):
    # groups inferred from weight shape: HWIO has I = c_in // groups
    w = p["w"] if "w" in p else p["w_q"]
    groups = x.shape[-1] // w.shape[2]
    return conv_block(p, s, x, stride=stride, groups=groups, act=act, training=training)


# Plain conv2d with bias, no BN/act (head output projections)
def init_conv2d_bias(rng, c1: int, c2: int, k: int = 1, dtype=jnp.float32):
    p, _ = init_conv_block(rng, c1, c2, k, bn=False, bias=True, dtype=dtype)
    return p, {}


def apply_conv2d_bias(p: Params, x):
    x = as_float(x, p["w"].dtype)
    y = conv2d(x, p["w"])
    return y + p["b"].astype(y.dtype)


# ---------------------------------------------------------------------------
# Bottleneck / C3k / C3k2
# ---------------------------------------------------------------------------

def init_bottleneck(rng, c1: int, c2: int, *, e: float = 0.5, k: Tuple[int, int] = (3, 3), dtype=jnp.float32):
    c_ = int(c2 * e)
    r1, r2 = _split(rng, 2)
    p1, s1 = init_conv(r1, c1, c_, k[0], dtype=dtype)
    p2, s2 = init_conv(r2, c_, c2, k[1], dtype=dtype)
    return {"cv1": p1, "cv2": p2}, {"cv1": s1, "cv2": s2}


def apply_bottleneck(p, s, x, *, add: bool, training: bool = False):
    y, s1 = apply_conv(p["cv1"], s["cv1"] if s else None, x, training=training)
    y, s2 = apply_conv(p["cv2"], s["cv2"] if s else None, y, training=training)
    out = q_add(x, y) if add else y
    return out, ({"cv1": s1, "cv2": s2} if s else s)


def init_c3k(rng, c1: int, c2: int, n: int = 2, *, e: float = 0.5, dtype=jnp.float32):
    c_ = int(c2 * e)
    rngs = _split(rng, 3 + n)
    p1, s1 = init_conv(rngs[0], c1, c_, 1, dtype=dtype)
    p2, s2 = init_conv(rngs[1], c1, c_, 1, dtype=dtype)
    p3, s3 = init_conv(rngs[2], 2 * c_, c2, 1, dtype=dtype)
    ms = [init_bottleneck(r, c_, c_, e=1.0) for r in rngs[3:]]
    return (
        {"cv1": p1, "cv2": p2, "cv3": p3, "m": [m[0] for m in ms]},
        {"cv1": s1, "cv2": s2, "cv3": s3, "m": [m[1] for m in ms]},
    )


def apply_c3k(p, s, x, *, shortcut: bool = True, training: bool = False):
    a, s1 = apply_conv(p["cv1"], s["cv1"] if s else None, x, training=training)
    b, s2 = apply_conv(p["cv2"], s["cv2"] if s else None, x, training=training)
    sm = []
    for i, mp in enumerate(p["m"]):
        a, smi = apply_bottleneck(mp, s["m"][i] if s else None, a, add=shortcut, training=training)
        sm.append(smi)
    y, s3 = apply_conv(p["cv3"], s["cv3"] if s else None, q_concat([a, b], axis=-1), training=training)
    return y, ({"cv1": s1, "cv2": s2, "cv3": s3, "m": sm} if s else s)


def init_c3k2(rng, c1: int, c2: int, n: int, *, c3k: bool, e: float = 0.5, dtype=jnp.float32):
    c = int(c2 * e)
    rngs = _split(rng, 2 + n)
    p1, s1 = init_conv(rngs[0], c1, 2 * c, 1, dtype=dtype)
    p2, s2 = init_conv(rngs[1], (2 + n) * c, c2, 1, dtype=dtype)
    if c3k:
        ms = [init_c3k(r, c, c, 2, dtype=dtype) for r in rngs[2:]]
    else:
        ms = [init_bottleneck(r, c, c, e=0.5, dtype=dtype) for r in rngs[2:]]
    return (
        {"cv1": p1, "cv2": p2, "m": [m[0] for m in ms]},
        {"cv1": s1, "cv2": s2, "m": [m[1] for m in ms]},
    )


def apply_c3k2(p, s, x, *, c3k: bool, shortcut: bool = True, training: bool = False):
    y0, s1 = apply_conv(p["cv1"], s["cv1"] if s else None, x, training=training)
    a, b = q_split2(y0, axis=-1)
    ys = [a, b]
    sm = []
    for i, mp in enumerate(p["m"]):
        si = s["m"][i] if s else None
        if c3k:
            y, smi = apply_c3k(mp, si, ys[-1], shortcut=shortcut, training=training)
        else:
            y, smi = apply_bottleneck(mp, si, ys[-1], add=shortcut, training=training)
        ys.append(y)
        sm.append(smi)
    out, s2 = apply_conv(p["cv2"], s["cv2"] if s else None, q_concat(ys, axis=-1), training=training)
    return out, ({"cv1": s1, "cv2": s2, "m": sm} if s else s)


# ---------------------------------------------------------------------------
# SPPF
# ---------------------------------------------------------------------------

def init_sppf(rng, c1: int, c2: int, dtype=jnp.float32):
    c_ = c1 // 2
    r1, r2 = _split(rng, 2)
    p1, s1 = init_conv(r1, c1, c_, 1, dtype=dtype)
    p2, s2 = init_conv(r2, c_ * 4, c2, 1, dtype=dtype)
    return {"cv1": p1, "cv2": p2}, {"cv1": s1, "cv2": s2}


def apply_sppf(p, s, x, *, k: int = 5, training: bool = False):
    y, s1 = apply_conv(p["cv1"], s["cv1"] if s else None, x, training=training)
    y1 = _q_maxpool(y, k)
    y2 = _q_maxpool(y1, k)
    y3 = _q_maxpool(y2, k)
    out, s2 = apply_conv(p["cv2"], s["cv2"] if s else None, q_concat([y, y1, y2, y3], axis=-1), training=training)
    return out, ({"cv1": s1, "cv2": s2} if s else s)


# ---------------------------------------------------------------------------
# C2PSA (position-sensitive spatial attention on P5)
# ---------------------------------------------------------------------------

def init_attention(rng, dim: int, *, num_heads: int, attn_ratio: float = 0.5, dtype=jnp.float32):
    head_dim = dim // num_heads
    key_dim = int(head_dim * attn_ratio)
    h = dim + num_heads * key_dim * 2
    r1, r2, r3 = _split(rng, 3)
    qkv_p, qkv_s = init_conv(r1, dim, h, 1, dtype=dtype)
    proj_p, proj_s = init_conv(r2, dim, dim, 1, dtype=dtype)
    pe_p, pe_s = init_conv(r3, dim, dim, 3, groups=dim, dtype=dtype)
    return (
        {"qkv": qkv_p, "proj": proj_p, "pe": pe_p},
        {"qkv": qkv_s, "proj": proj_s, "pe": pe_s},
    )


def _attn_impl(qkv, s, training: bool, impl: str, n: int, d_in: int, d_out: int) -> str:
    """Attention implementation choice: "fused" | "pallas" | "xla".

    "fused" (attention_qkv_fused_pallas) is the deploy-time default on the
    TPU backend: it consumes the raw qkv-conv slab with no head-major
    repack — the b32 device trace showed the XLA path's pack fusion at
    1.47 ms and its f32 softmax chain at ~1.6 ms, vs ~0.2 ms for the whole
    fused kernel (tools/bench_attn_fused.py, 2026-08-19). The kernel
    query-row-tiles itself when the f32 score stack would blow the 16 MB
    scoped-VMEM limit (N=1600 at s/m slab width OOM'd whole-row in
    production, 2026-08-19); only shapes where no tiling fits fall back.

    "pallas" (opt-in via YOLO_ATTN_IMPL=pallas) is the older per-(batch,
    head) kernel fed by a host-side pack: measured 2.1x slower than XLA
    standalone (5.66 vs 2.71 ms at n-scale b128) — kept as a tested
    alternative. impl="xla" always forces the einsum path (GSPMD mesh,
    training), as does any quantized/traced-through activation type.
    """
    import os

    if (
        impl == "xla"
        or training
        or s is not None
        or not isinstance(qkv, jnp.ndarray)
        or jax.default_backend() == "cpu"
    ):
        return "xla"
    env = os.environ.get("YOLO_ATTN_IMPL", "")
    if env in ("xla", "pallas", "fused"):
        return env
    # shape-aware VMEM gate: the kernel row-tiles itself down to the scoped
    # limit (ops/pallas/attention_fused.pick_q_rows); only shapes where no
    # tiling fits (huge N x wide slab) fall back to XLA. The old N-only
    # gate (N^2*4 <= 12M) let s/m @1280 whole-batch through to a compile
    # OOM: the slab/out pipeline buffers also count against scoped VMEM.
    from yolo_infer_tpu.ops.pallas.attention_fused import pick_q_rows

    return "fused" if pick_q_rows(n, d_in, d_out) else "xla"


def apply_attention(p, s, x, *, num_heads: int, attn_ratio: float = 0.5, training: bool = False, impl: str = "auto"):
    B, H, W, C = x.shape
    N = H * W
    head_dim = C // num_heads
    key_dim = int(head_dim * attn_ratio)
    scale = key_dim ** -0.5

    qkv_raw, s1 = apply_conv(p["qkv"], s["qkv"] if s else None, x, act=False, training=training)
    chosen = _attn_impl(qkv_raw, s, training, impl, N, qkv_raw.shape[-1], C)
    qkv = qkv_raw.reshape(B, N, num_heads, key_dim * 2 + head_dim)
    if chosen == "fused":
        from yolo_infer_tpu.ops.pallas.attention_fused import attention_qkv_fused_pallas

        o = attention_qkv_fused_pallas(
            qkv_raw.reshape(B, N, -1), num_heads, key_dim, head_dim
        )  # (B, N, heads*head_dim), head-major — same channel order as the
        # XLA path's (B, heads, N, hd) -> (B, N, heads, hd) unpack below
        out = o.reshape(B, H, W, C)
    elif chosen == "pallas":
        from yolo_infer_tpu.ops.pallas.attention_fused import attention_fused_pallas

        g = B * num_heads
        qg = qkv.transpose(0, 2, 1, 3).reshape(g, N, key_dim * 2 + head_dim)
        o = attention_fused_pallas(qg, key_dim, head_dim)
        out = o.reshape(B, num_heads, N, head_dim).transpose(0, 2, 1, 3).reshape(B, H, W, C)
    else:
        q, k, v = jnp.split(qkv, [key_dim, key_dim * 2], axis=-1)
        # (B*heads, N, d) batched dot_generals: keeping the head axis
        # interleaved ("bind,bjnd->bnij" einsum) makes XLA materialize
        # pathological layouts standalone (tools/bench_stem_attn.py).
        qt = q.transpose(0, 2, 1, 3).reshape(B * num_heads, N, key_dim)
        kt = k.transpose(0, 2, 1, 3).reshape(B * num_heads, N, key_dim)
        vt = v.transpose(0, 2, 1, 3).reshape(B * num_heads, N, head_dim)
        attn = jax.lax.dot_general(qt, kt, (((2,), (2,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jax.lax.dot_general(attn, vt, (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(B, num_heads, N, head_dim).transpose(0, 2, 1, 3).reshape(B, H, W, C)
    v_spatial = qkv[..., 2 * key_dim :].reshape(B, H, W, C)
    pe, s2 = apply_conv(p["pe"], s["pe"] if s else None, v_spatial, act=False, training=training)
    out, s3 = apply_conv(p["proj"], s["proj"] if s else None, out + pe, act=False, training=training)
    return out, ({"qkv": s1, "pe": s2, "proj": s3} if s else s)


def init_psablock(rng, c: int, *, num_heads: int, dtype=jnp.float32):
    r1, r2, r3 = _split(rng, 3)
    attn_p, attn_s = init_attention(r1, c, num_heads=num_heads, dtype=dtype)
    f1_p, f1_s = init_conv(r2, c, c * 2, 1, dtype=dtype)
    f2_p, f2_s = init_conv(r3, c * 2, c, 1, dtype=dtype)
    return (
        {"attn": attn_p, "ffn1": f1_p, "ffn2": f2_p},
        {"attn": attn_s, "ffn1": f1_s, "ffn2": f2_s},
    )


def apply_psablock(p, s, x, *, num_heads: int, training: bool = False, impl: str = "auto"):
    a, s1 = apply_attention(p["attn"], s["attn"] if s else None, x, num_heads=num_heads, training=training, impl=impl)
    x = q_add(x, a)
    f, s2 = apply_conv(p["ffn1"], s["ffn1"] if s else None, x, training=training)
    f, s3 = apply_conv(p["ffn2"], s["ffn2"] if s else None, f, act=False, training=training)
    x = q_add(x, f)
    return x, ({"attn": s1, "ffn1": s2, "ffn2": s3} if s else s)


def init_c2psa(rng, c1: int, n: int, *, e: float = 0.5, dtype=jnp.float32):
    c = int(c1 * e)
    num_heads = max(c // 64, 1)
    rngs = _split(rng, 2 + n)
    p1, s1 = init_conv(rngs[0], c1, 2 * c, 1, dtype=dtype)
    p2, s2 = init_conv(rngs[1], 2 * c, c1, 1, dtype=dtype)
    ms = [init_psablock(r, c, num_heads=num_heads, dtype=dtype) for r in rngs[2:]]
    return (
        {"cv1": p1, "cv2": p2, "m": [m[0] for m in ms]},
        {"cv1": s1, "cv2": s2, "m": [m[1] for m in ms]},
    )


def apply_c2psa(p, s, x, *, e: float = 0.5, training: bool = False, attn_impl: str = "auto"):
    c1 = x.shape[-1]
    c = int(c1 * e)
    num_heads = max(c // 64, 1)
    y, s1 = apply_conv(p["cv1"], s["cv1"] if s else None, x, training=training)
    a, b = q_split_at(y, c, axis=-1)
    sm = []
    for i, mp in enumerate(p["m"]):
        b, smi = apply_psablock(mp, s["m"][i] if s else None, b, num_heads=num_heads, training=training, impl=attn_impl)
        sm.append(smi)
    out, s2 = apply_conv(p["cv2"], s["cv2"] if s else None, q_concat([a, b], axis=-1), training=training)
    return out, ({"cv1": s1, "cv2": s2, "m": sm} if s else s)


# ---------------------------------------------------------------------------
# Heads
# ---------------------------------------------------------------------------

def _init_branch(rng, chain: Sequence[Tuple[str, int, int, int]], dtype=jnp.float32):
    """chain entries: (kind, c1, c2, k) with kind in {conv, dwconv, conv2d}."""
    rngs = _split(rng, len(chain))
    ps, ss = [], []
    for r, (kind, c1, c2, k) in zip(rngs, chain):
        if kind == "conv":
            p, s = init_conv(r, c1, c2, k, dtype=dtype)
        elif kind == "dwconv":
            p, s = init_dwconv(r, c1, c2, k, dtype=dtype)
        elif kind == "conv2d":
            p, s = init_conv2d_bias(r, c1, c2, k, dtype=dtype)
        else:
            raise ValueError(kind)
        ps.append(p)
        ss.append(s)
    return ps, ss


def _apply_branch(ps, ss, x, kinds, training=False):
    new_ss = []
    for i, (p, kind) in enumerate(zip(ps, kinds)):
        if kind == "conv2d":
            x = apply_conv2d_bias(p, x)
            new_ss.append({})
        else:
            x, si = apply_conv(p, ss[i] if ss else None, x, training=training)
            new_ss.append(si)
    return x, (new_ss if ss else ss)


def detect_branch_channels(ch: Sequence[int], nc: int, reg_max: int) -> Tuple[int, int]:
    c2 = max(16, ch[0] // 4, reg_max * 4)
    c3 = max(ch[0], min(nc, 100))
    return c2, c3


def init_detect(rng, ch: Sequence[int], nc: int, reg_max: int = 16, *, strides=(8, 16, 32), dtype=jnp.float32):
    """Decoupled anchor-free detect head (box DFL branch + DW cls branch)."""
    c2, c3 = detect_branch_channels(ch, nc, reg_max)
    rngs = _split(rng, 2 * len(ch))
    cv2_p, cv2_s, cv3_p, cv3_s = [], [], [], []
    for i, c in enumerate(ch):
        bp, bs = _init_branch(
            rngs[2 * i],
            [("conv", c, c2, 3), ("conv", c2, c2, 3), ("conv2d", c2, 4 * reg_max, 1)],
            dtype=dtype,
        )
        cp, cs = _init_branch(
            rngs[2 * i + 1],
            [
                ("dwconv", c, c, 3),
                ("conv", c, c3, 1),
                ("dwconv", c3, c3, 3),
                ("conv", c3, c3, 1),
                ("conv2d", c3, nc, 1),
            ],
            dtype=dtype,
        )
        # bias priors for stable early training (box=1, cls = prior freq)
        bp[-1]["b"] = jnp.full_like(bp[-1]["b"], 1.0)
        cp[-1]["b"] = jnp.full_like(cp[-1]["b"], math.log(5 / nc / (640 / strides[i]) ** 2))
        cv2_p.append(bp)
        cv2_s.append(bs)
        cv3_p.append(cp)
        cv3_s.append(cs)
    return {"cv2": cv2_p, "cv3": cv3_p}, {"cv2": cv2_s, "cv3": cv3_s}


_BOX_KINDS = ("conv", "conv", "conv2d")
_CLS_KINDS = ("dwconv", "conv", "dwconv", "conv", "conv2d")


def apply_detect(p, s, xs: Sequence[jnp.ndarray], *, training: bool = False):
    """Returns per-level (B, H, W, 4*reg_max + nc) raw maps."""
    outs = []
    s2, s3 = [], []
    for i, x in enumerate(xs):
        box, sb = _apply_branch(p["cv2"][i], s["cv2"][i] if s else None, x, _BOX_KINDS, training)
        cls, sc = _apply_branch(p["cv3"][i], s["cv3"][i] if s else None, x, _CLS_KINDS, training)
        outs.append(jnp.concatenate([box, cls], axis=-1))
        s2.append(sb)
        s3.append(sc)
    return outs, ({"cv2": s2, "cv3": s3} if s else s)


def init_extra_branch(rng, ch: Sequence[int], c_mid: int, c_out: int, dtype=jnp.float32):
    """The cv4 branch shared by Segment (mask coefs), Pose (kpts), OBB (angle)."""
    rngs = _split(rng, len(ch))
    ps, ss = [], []
    for r, c in zip(rngs, ch):
        bp, bs = _init_branch(r, [("conv", c, c_mid, 3), ("conv", c_mid, c_mid, 3), ("conv2d", c_mid, c_out, 1)], dtype=dtype)
        ps.append(bp)
        ss.append(bs)
    return ps, ss


def apply_extra_branch(ps, ss, xs, training=False):
    outs, new_ss = [], []
    for i, x in enumerate(xs):
        y, si = _apply_branch(ps[i], ss[i] if ss else None, x, _BOX_KINDS, training)
        outs.append(y)
        new_ss.append(si)
    return outs, (new_ss if ss else ss)


def init_proto(rng, c1: int, c_: int, nm: int, dtype=jnp.float32):
    """Mask-prototype head: Conv -> ConvTranspose2d(2,2) -> Conv -> Conv."""
    import math as _math

    r1, r2, r3, r4 = _split(rng, 4)
    p1, s1 = init_conv(r1, c1, c_, 3, dtype=dtype)
    fan_in = c_ * 2 * 2
    bound = _math.sqrt(1.0 / fan_in) * _math.sqrt(3.0)
    wk, bk = jax.random.split(r2)
    p_up = {
        # key "wt" (not "w") so quantization/fold tree-walks skip this
        # transposed-conv node
        "wt": jax.random.uniform(wk, (2, 2, c_, c_), dtype, -bound, bound),  # (kh,kw,O,I)
        "b": jax.random.uniform(bk, (c_,), dtype, -bound, bound),
    }
    p2, s2 = init_conv(r3, c_, c_, 3, dtype=dtype)
    p3, s3 = init_conv(r4, c_, nm, 1, dtype=dtype)
    return (
        {"cv1": p1, "up": p_up, "cv2": p2, "cv3": p3},
        {"cv1": s1, "cv2": s2, "cv3": s3},
    )


def apply_proto(p, s, x, training=False):
    from yolo_infer_tpu.nn.layers import conv_transpose2x

    y, s1 = apply_conv(p["cv1"], s["cv1"] if s else None, x, training=training)
    y = as_float(y, p["up"]["wt"].dtype)
    y = conv_transpose2x(y, p["up"]["wt"], p["up"].get("b"))
    y, s2 = apply_conv(p["cv2"], s["cv2"] if s else None, y, training=training)
    y, s3 = apply_conv(p["cv3"], s["cv3"] if s else None, y, training=training)
    return y, ({"cv1": s1, "cv2": s2, "cv3": s3} if s else s)


def init_classify(rng, c1: int, nc: int, c_hidden: int = 1280, dtype=jnp.float32):
    r1, r2 = _split(rng, 2)
    conv_p, conv_s = init_conv(r1, c1, c_hidden, 1, dtype=dtype)
    lin_p = init_dense(r2, c_hidden, nc, dtype=dtype)
    return {"conv": conv_p, "linear": lin_p}, {"conv": conv_s}


def apply_classify(p, s, x, training=False):
    y, s1 = apply_conv(p["conv"], s["conv"] if s else None, x, training=training)
    y = adaptive_avg_pool(as_float(y, p["linear"]["w"].dtype))
    logits = dense(p["linear"], y)
    return logits, ({"conv": s1} if s else s)
