#!/usr/bin/env python
"""Pallas fused int8 conv vs XLA int8 vs bf16, chained in-jit (tunnel-proof).

Each variant runs R chained convs (Ci==Co so int8 outputs feed back in)
inside one dispatch; the ~1 ms/dispatch tunnel floor amortizes away.

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_pallas_conv.py
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from yolo_infer_tpu.ops.pallas.int8_conv import int8_conv3x3_fused, xla_reference

R = 12
SHAPES = [(80, 80, 64), (40, 40, 128), (20, 20, 256), (160, 160, 32)]


def sync(x):
    np.asarray(jax.device_get(x.ravel()[:1]))


def timeit(fn, *args, runs=15):
    out = fn(*args)
    sync(out)
    for _ in range(3):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / runs


def silu(x):
    return x * jax.nn.sigmoid(x)


def main():
    batches = [int(b) for b in os.environ.get("BATCHES", "32,128").split(",")]
    rng = np.random.default_rng(0)
    for h, w, c in SHAPES:
        wq = jnp.asarray(rng.integers(-20, 21, (3, 3, c, c)), jnp.int8)
        wb = jnp.asarray(rng.normal(0, 0.02, (3, 3, c, c)), jnp.bfloat16)
        scale = jnp.full((c,), 1.5e-4, jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)
        sy = jnp.float32(0.02)

        @jax.jit
        def f_pallas(x, wq=wq, scale=scale, bias=bias, sy=sy):
            for _ in range(R):
                x = int8_conv3x3_fused(x, wq, scale, bias, sy)
            return x

        @jax.jit
        def f_xla_i8(x, wq=wq, scale=scale, bias=bias, sy=sy):
            for _ in range(R):
                x = xla_reference(x, wq, scale, bias, sy)
            return x

        @jax.jit
        def f_bf16(x, wb=wb):
            from jax import lax

            for _ in range(R):
                x = silu(lax.conv_general_dilated(
                    x, wb, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC")))
            return x

        for b in batches:
            xq = jnp.asarray(rng.integers(-127, 128, (b, h, w, c)), jnp.int8)
            xb = jnp.asarray(rng.normal(0, 1, (b, h, w, c)), jnp.bfloat16)
            flops = 2 * b * h * w * c * c * 9 * R
            row = {"shape": f"{h}x{w}x{c}", "batch": b}
            for name, fn, arg in (("pallas_i8", f_pallas, xq), ("xla_i8", f_xla_i8, xq), ("bf16", f_bf16, xb)):
                try:
                    dt = timeit(fn, arg)
                    row[name + "_ms"] = round(dt * 1e3, 3)
                    row[name + "_tflops"] = round(flops / dt / 1e12, 1)
                except Exception as e:  # noqa: BLE001
                    row[name + "_error"] = str(e)[:200]
            if "bf16_ms" in row:
                for name in ("pallas_i8", "xla_i8"):
                    if name + "_ms" in row:
                        row[name + "_speedup"] = round(row["bf16_ms"] / row[name + "_ms"], 3)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    sys.exit(main())
