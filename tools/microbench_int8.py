#!/usr/bin/env python
"""Microbenchmark: bf16 vs int8 conv strategies at real YOLO11 layer shapes.

Answers the design questions for the fused int8 serving path (VERDICT #1):
  1. Does XLA:TPU emit a fast int8 MXU conv (int8 x int8 -> int32)?
  2. How much does the dynamic-quant fp32 round-trip cost per conv?
  3. What does an int8-in/int8-out chain (static scales, requant fused into
     the epilogue, activations stored at 1 byte) buy over bf16 end-to-end?

Run on the real TPU (one process!): python tools/microbench_int8.py
Prints one JSON line per measurement and a summary table to stderr.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def sync(x):
    # block_until_ready is a no-op through the axon tunnel; force a tiny
    # device->host transfer instead (CLAUDE.md).
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(fn, *args, warmup=5, runs=30):
    t0 = time.perf_counter()
    out = fn(*args)
    sync(out)
    compile_s = time.perf_counter() - t0
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / runs
    return dt, compile_s


def conv(x, w, stride=1, pet=None):
    k = w.shape[0]
    p = k // 2
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pet,
    )


def silu(x):
    return x * jax.nn.sigmoid(x)


# representative yolo11n/m conv shapes: (H, W, Cin, Cout, k, stride)
SHAPES = [
    ("n_p2", 320, 320, 16, 32, 3, 2),
    ("n_p3", 160, 160, 32, 64, 3, 2),
    ("n_p4", 80, 80, 64, 128, 3, 2),
    ("n_p5", 40, 40, 128, 256, 3, 2),
    ("n_btl80", 80, 80, 32, 32, 3, 1),
    ("m_p4", 80, 80, 256, 512, 3, 2),
    ("m_btl40", 40, 40, 256, 256, 3, 1),
    ("pw128", 40, 40, 128, 128, 1, 1),
]


def bench_single(batch):
    rows = []
    key = jax.random.PRNGKey(0)
    for name, h, w_, ci, co, k, s in SHAPES:
        x = jax.random.normal(key, (batch, h, w_, ci), jnp.bfloat16)
        wgt = jax.random.normal(key, (k, k, ci, co), jnp.bfloat16) * 0.1
        w_q = jnp.clip(jnp.round(wgt.astype(jnp.float32) * 50), -127, 127).astype(jnp.int8)
        w_scale = jnp.full((co,), 0.02, jnp.float32)
        b = jnp.zeros((co,), jnp.float32)
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) * 25), -127, 127).astype(jnp.int8)
        xs = jnp.float32(0.04)
        out_inv_scale = jnp.float32(25.0)

        @jax.jit
        def f_bf16(x, wgt=wgt, b=b, s=s):
            y = conv(x, wgt, s)
            return silu(y + b.astype(y.dtype))

        @jax.jit
        def f_int8_dyn(x, w_q=w_q, w_scale=w_scale, b=b, s=s):
            # dynamic per-tensor activation quant, fp32 round trip (current path)
            xsc = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-6) / 127.0
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xsc), -127, 127).astype(jnp.int8)
            y = conv(xq, w_q, s, pet=jnp.int32)
            y = y.astype(jnp.float32) * (xsc * w_scale) + b
            return silu(y).astype(jnp.bfloat16)

        @jax.jit
        def f_int8_chain(xq, w_q=w_q, w_scale=w_scale, b=b, s=s, xs=xs, oinv=out_inv_scale):
            # int8 in -> int8 out: static scales, requant fused in epilogue
            y = conv(xq, w_q, s, pet=jnp.int32)
            y = y.astype(jnp.float32) * (xs * w_scale) + b
            y = silu(y)
            return jnp.clip(jnp.round(y * oinv), -127, 127).astype(jnp.int8)

        dt_bf, c_bf = timeit(f_bf16, x)
        dt_dyn, c_dy = timeit(f_int8_dyn, x)
        dt_ch, c_ch = timeit(f_int8_chain, x_q)
        flops = 2 * batch * (h // s) * (w_ / s) * ci * co * k * k
        row = {
            "bench": "single", "shape": name, "batch": batch,
            "bf16_us": round(dt_bf * 1e6, 1),
            "int8_dyn_us": round(dt_dyn * 1e6, 1),
            "int8_chain_us": round(dt_ch * 1e6, 1),
            "bf16_tflops": round(flops / dt_bf / 1e12, 1),
            "chain_tops": round(flops / dt_ch / 1e12, 1),
            "chain_speedup": round(dt_bf / dt_ch, 2),
            "dyn_speedup": round(dt_bf / dt_dyn, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def bench_chain(batch, depth=6):
    """depth consecutive 3x3 convs at a fixed shape: measures whether int8
    activations (1B in HBM) beat bf16 (2B) when chained."""
    rows = []
    key = jax.random.PRNGKey(1)
    for name, h, w_, c in [("chain80x64", 80, 80, 64), ("chain40x128", 40, 40, 128), ("chain40x256", 40, 40, 256)]:
        x = jax.random.normal(key, (batch, h, w_, c), jnp.bfloat16)
        wgt = [jax.random.normal(jax.random.fold_in(key, i), (3, 3, c, c), jnp.bfloat16) * (0.5 / c) for i in range(depth)]
        wq = [jnp.clip(jnp.round(w.astype(jnp.float32) * 400), -127, 127).astype(jnp.int8) for w in wgt]
        wsc = [jnp.full((c,), 1 / 400.0, jnp.float32) for _ in range(depth)]
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) * 25), -127, 127).astype(jnp.int8)

        @jax.jit
        def f_bf16(x, wgt=wgt):
            for w in wgt:
                x = silu(conv(x, w))
            return x

        @jax.jit
        def f_int8(xq, wq=wq, wsc=wsc):
            xs = jnp.float32(0.04)
            for i in range(depth):
                y = conv(xq, wq[i], pet=jnp.int32)
                y = silu(y.astype(jnp.float32) * (xs * wsc[i]))
                nxt = jnp.maximum(jnp.max(jnp.abs(y)) / 127.0, 1e-6)  # still static-ish; use dyn here
                xq = jnp.clip(jnp.round(y / nxt), -127, 127).astype(jnp.int8)
                xs = nxt
            return y

        @jax.jit
        def f_int8_static(xq, wq=wq, wsc=wsc):
            xs = jnp.float32(0.04)
            oinv = jnp.float32(25.0)
            for i in range(depth):
                y = conv(xq, wq[i], pet=jnp.int32)
                y = silu(y.astype(jnp.float32) * (xs * wsc[i]))
                xq = jnp.clip(jnp.round(y * oinv), -127, 127).astype(jnp.int8)
                xs = 1.0 / 25.0
            return y

        dt_bf, _ = timeit(f_bf16, x)
        dt_i8, _ = timeit(f_int8, x_q)
        dt_i8s, _ = timeit(f_int8_static, x_q)
        flops = 2 * batch * h * w_ * c * c * 9 * depth
        row = {
            "bench": "chain", "shape": name, "batch": batch, "depth": depth,
            "bf16_us": round(dt_bf * 1e6, 1),
            "int8_dynchain_us": round(dt_i8 * 1e6, 1),
            "int8_static_us": round(dt_i8s * 1e6, 1),
            "bf16_tflops": round(flops / dt_bf / 1e12, 1),
            "static_speedup": round(dt_bf / dt_i8s, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def bench_matmul():
    """Raw MXU rate check: int8 vs bf16 matmul."""
    key = jax.random.PRNGKey(2)
    for m, k, n in [(8192, 2048, 2048)]:
        a = jax.random.normal(key, (m, k), jnp.bfloat16)
        b = jax.random.normal(key, (k, n), jnp.bfloat16)
        aq = jnp.clip(jnp.round(a.astype(jnp.float32) * 25), -127, 127).astype(jnp.int8)
        bq = jnp.clip(jnp.round(b.astype(jnp.float32) * 25), -127, 127).astype(jnp.int8)

        f_bf = jax.jit(lambda a, b: jnp.dot(a, b))
        f_i8 = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.int32))
        dt_bf, _ = timeit(f_bf, a, b)
        dt_i8, _ = timeit(f_i8, aq, bq)
        flops = 2 * m * k * n
        row = {
            "bench": "matmul", "mkn": [m, k, n],
            "bf16_tflops": round(flops / dt_bf / 1e12, 1),
            "int8_tops": round(flops / dt_i8 / 1e12, 1),
            "int8_speedup": round(dt_bf / dt_i8, 2),
        }
        print(json.dumps(row), flush=True)


def main():
    print(json.dumps({"backend": jax.default_backend(), "device": str(jax.devices()[0])}), flush=True)
    bench_matmul()
    for batch in (32, 128):
        bench_single(batch)
    for batch in (32, 128):
        bench_chain(batch)


if __name__ == "__main__":
    sys.exit(main())
