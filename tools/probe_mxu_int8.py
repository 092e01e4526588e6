#!/usr/bin/env python
"""Probe: is the v5e MXU's int8 rate (2x bf16) reachable from Pallas / XLA?

The axon tunnel has a ~1 ms per-dispatch floor, so every measurement chains
R data-dependent matmuls inside ONE jitted call (output feeds the next input
through a cheap elementwise cast) — per-call overhead amortizes to <2%.

PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_mxu_int8.py
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 1024
K = N = 2048  # square so outputs can feed back as inputs
TM = TN = 256
KC = 512
R = 64  # chained matmuls per dispatch


def matmul_kernel(a_ref, b_ref, o_ref, acc_dtype):
    def body(i, acc):
        a = a_ref[:, pl.ds(i * KC, KC)]
        b = b_ref[pl.ds(i * KC, KC), :]
        return acc + jnp.dot(a, b, preferred_element_type=acc_dtype)

    o_ref[:] = jax.lax.fori_loop(0, K // KC, body, jnp.zeros((TM, TN), acc_dtype))


def pallas_matmul(a, b, acc_dtype):
    return pl.pallas_call(
        functools.partial(matmul_kernel, acc_dtype=acc_dtype),
        grid=(M // TM, N // TN),
        in_specs=[
            pl.BlockSpec((TM, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), acc_dtype),
    )(a, b)


def make_chain(mm, feedback):
    @jax.jit
    def f(a, b):
        for _ in range(R):
            o = mm(a, b)
            a = feedback(o)
        return o

    return f


def fb_bf16(o):
    return (o * 1e-3).astype(jnp.bfloat16)


def fb_int8(o):
    return (o & 127).astype(jnp.int8) - 64


def sync(x):
    np.asarray(jax.device_get(x.ravel()[:1]))


def timeit(fn, *args, runs=10):
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


def main():
    key = jax.random.PRNGKey(0)
    a_bf = jax.random.normal(key, (M, K), jnp.bfloat16)
    b_bf = jax.random.normal(key, (K, N), jnp.bfloat16) * (1.0 / K)
    a_i8 = jnp.clip(jnp.round(a_bf.astype(jnp.float32) * 25), -127, 127).astype(jnp.int8)
    b_i8 = jnp.clip(jnp.round(b_bf.astype(jnp.float32) * 500), -127, 127).astype(jnp.int8)

    flops = 2 * M * N * K * R
    cases = [
        ("xla_bf16", make_chain(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32), fb_bf16), (a_bf, b_bf)),
        ("xla_int8", make_chain(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.int32), fb_int8), (a_i8, b_i8)),
        ("pallas_bf16", make_chain(lambda a, b: pallas_matmul(a, b, jnp.float32), fb_bf16), (a_bf, b_bf)),
        ("pallas_int8", make_chain(lambda a, b: pallas_matmul(a, b, jnp.int32), fb_int8), (a_i8, b_i8)),
    ]
    results = {}
    for name, fn, args in cases:
        try:
            dt = timeit(fn, *args)
            results[name] = {"ms": round(dt * 1e3, 2), "tflops": round(flops / dt / 1e12, 1)}
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": str(e)[:400]}
        print(json.dumps({name: results[name]}), flush=True)

    for pair in (("xla_int8", "xla_bf16"), ("pallas_int8", "pallas_bf16"), ("pallas_bf16", "xla_bf16")):
        x, y = (results.get(p, {}) for p in pair)
        if "tflops" in x and "tflops" in y:
            print(json.dumps({f"{pair[0]}_vs_{pair[1]}": round(x["tflops"] / y["tflops"], 2)}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
