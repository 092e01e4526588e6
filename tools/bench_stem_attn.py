#!/usr/bin/env python
"""XLA-level experiments for the two yolo11n b128 forward hot spots
(tools/profile_forward.py: stem layers 0-1 = 4.9 ms, C2PSA = 2.1 ms).

Stem variants (conv0 3->16 s2 @640, conv1 16->32 s2 @320, bf16, BN folded):
  pair_base   — production apply_conv pair
  conv0_only / conv1_only — split the cost
  pair_s2d0   — space-to-depth rewrite of conv0 only (round-1 A/B path)
  pair_s2d01  — s2d rewrite of both convs

Attention variants (C=128 attn width, heads=2, key_dim 32, N=400, b128):
  attn_base   — production einsum path (f32 attn matrix)
  attn_bf16   — bf16 attn matrix (softmax still max-subtracted)
  attn_nhd    — (B*heads) flattened batched dot_general layout

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_stem_attn.py

MEASURED (v5e-1, b128):
  stem: pair_base 4.77 ms (conv0 alone 4.14, conv1 2.30 standalone);
    s2d conv0-only 5.29, s2d both 6.63 — every rewrite LOSES to XLA's
    batch-in-lanes VPU emitter. Also measured (tools/probe_stem_toeplitz.py,
    /tmp probes): channel-pad to 4 = 9.63, to 8 = 6.01, f32 = 5.33,
    NCHW = 4.77, Toeplitz 3-GEMM = 25.3. conv0 stands at XLA's floor.
  attention: base einsum 32.4 ms STANDALONE (layout artifact of the isolated
    jit — in-model XLA picks good layouts), bf16-matrix 23.2, flattened
    (B*heads, N, d) dot_general 2.05 ms exact. The flat layout is production;
    in-model e2e is unchanged (XLA already handled the fused case).
"""

import json
import os
import sys
import time

import numpy as np


def sync(x):
    import jax

    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def bench(fn, args, runs=30):
    out = fn(*args)
    sync(out)
    for _ in range(3):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / runs * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.models import blocks as B
    from yolo_infer_tpu.nn.layers import stem_conv_s2d

    b = int(os.environ.get("B", "128"))
    rng = np.random.default_rng(0)
    res = {}

    def record(name, fn):
        try:
            res[name] = round(fn(), 3)
        except Exception as e:  # noqa: BLE001
            res[name + "_err"] = str(e).replace("\n", " ")[:160]
        print(json.dumps({name: res.get(name, res.get(name + "_err"))}), flush=True)

    model = YOLO11Model("yolo11n")
    params = model.deploy_params
    p0, p1 = params["0"], params["1"]
    x = jnp.asarray(rng.standard_normal((b, 640, 640, 3)).astype(np.float32), jnp.bfloat16)

    def pair_base(p0, p1, x):
        y, _ = B.apply_conv(p0, None, x, stride=2)
        y, _ = B.apply_conv(p1, None, y, stride=2)
        return y

    def conv0_only(p0, x):
        y, _ = B.apply_conv(p0, None, x, stride=2)
        return y

    def pair_s2d0(p0, p1, x):
        y, _ = stem_conv_s2d(p0, None, x)
        y, _ = B.apply_conv(p1, None, y, stride=2)
        return y

    def pair_s2d01(p0, p1, x):
        y, _ = stem_conv_s2d(p0, None, x)
        y, _ = stem_conv_s2d(p1, None, y)
        return y

    f_pair = jax.jit(pair_base)
    f_c0 = jax.jit(conv0_only)
    y0 = jax.jit(lambda p, x: B.apply_conv(p, None, x, stride=2)[0])(p0, x)
    y0 = jax.block_until_ready(y0)
    f_c1 = jax.jit(lambda p1, y: B.apply_conv(p1, None, y, stride=2)[0])
    f_s2d0 = jax.jit(pair_s2d0)
    f_s2d01 = jax.jit(pair_s2d01)

    record("pair_base_ms", lambda: bench(f_pair, (p0, p1, x)))
    record("conv0_only_ms", lambda: bench(f_c0, (p0, x)))
    record("conv1_only_ms", lambda: bench(f_c1, (p1, y0)))
    record("pair_s2d0_ms", lambda: bench(f_s2d0, (p0, p1, x)))
    record("pair_s2d01_ms", lambda: bench(f_s2d01, (p0, p1, x)))
    record("s2d01_maxdiff", lambda: float(jnp.max(jnp.abs(
        f_pair(p0, p1, x).astype(jnp.float32) - f_s2d01(p0, p1, x).astype(jnp.float32)))))

    # ---- attention ----
    import jax.nn

    C, heads, N = 128, 2, 400
    hd, kd = 64, 32
    q = jnp.asarray(rng.standard_normal((b, N, heads, kd)).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, N, heads, kd)).astype(np.float32), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, N, heads, hd)).astype(np.float32), jnp.bfloat16)
    scale = kd ** -0.5

    def attn_base(q, k, v):
        attn = jnp.einsum("bind,bjnd->bnij", q, k, preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
        return jnp.einsum("bnij,bjnd->bind", attn, v)

    def attn_bf16(q, k, v):
        attn = (jnp.einsum("bind,bjnd->bnij", q, k, preferred_element_type=jnp.float32) * scale).astype(jnp.bfloat16)
        m = jnp.max(attn, axis=-1, keepdims=True)
        e = jnp.exp((attn - m).astype(jnp.float32)).astype(jnp.bfloat16)
        attn = e / jnp.sum(e, axis=-1, keepdims=True).astype(jnp.bfloat16)
        return jnp.einsum("bnij,bjnd->bind", attn, v)

    def attn_nhd(q, k, v):
        # (B*heads, N, d) batched dots — no interleaved head axis
        qt = q.transpose(0, 2, 1, 3).reshape(b * heads, N, kd)
        kt = k.transpose(0, 2, 1, 3).reshape(b * heads, N, kd)
        vt = v.transpose(0, 2, 1, 3).reshape(b * heads, N, hd)
        attn = jax.lax.dot_general(qt, kt, (((2,), (2,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
        o = jax.lax.dot_general(attn, vt, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32).astype(q.dtype)
        return o.reshape(b, heads, N, hd).transpose(0, 2, 1, 3)

    fa, fb, fc = jax.jit(attn_base), jax.jit(attn_bf16), jax.jit(attn_nhd)
    record("attn_base_ms", lambda: bench(fa, (q, k, v)))
    record("attn_bf16_ms", lambda: bench(fb, (q, k, v)))
    record("attn_nhd_ms", lambda: bench(fc, (q, k, v)))
    record("attn_nhd_maxdiff", lambda: float(jnp.max(jnp.abs(
        fa(q, k, v).astype(jnp.float32) - fc(q, k, v).astype(jnp.float32)))))

    print(json.dumps(res))


if __name__ == "__main__":
    sys.exit(main())
