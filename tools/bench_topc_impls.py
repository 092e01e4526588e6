#!/usr/bin/env python
"""A/B the per-anchor top-C candidate reduction for multi-label val NMS.

The val program's (A*nc)=672k-per-image candidate selection was measured at
~1.06 ms/img (flat exact-ApproxTopK, tools/bench_val_loop.py). Replacing it
with a per-anchor lax.top_k(nc=80 -> C=8) moved NOTHING (30.12 vs 30.48 ms
val program at n/b16, /tmp/val_loop_topc.log): XLA lowers rowwise top_k to a
full variadic sort, which touches the same 672k (value, index) pairs.

Candidates measured here, isolated, sustained-protocol:
  flat      — exact ApproxTopK over (B, A*nc) -> pre_topk   (the baseline)
  rowsort   — lax.top_k((B, A, nc), C) then flat ApproxTopK over A*C
  itermax   — C rounds of max/argmax + one-hot mask (VPU passes, no sort),
              then flat ApproxTopK over A*C

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_topc_impls.py
env: B=16 A=8400 NC=80 C=8 PRE_TOPK=4096 RUNS=50
"""

import json
import os
import time

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def bench(fn, args, runs):
    out = fn(*args)
    sync(out)
    for _ in range(3):
        out = fn(*args)
    sync(out)
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(runs):
            out = fn(*args)
        sync(out)
        reps.append((time.perf_counter() - t0) / runs)
    return float(np.median(reps)) * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from yolo_infer_tpu.ops.nms import _exact_topk

    b = int(os.environ.get("B", "16"))
    a = int(os.environ.get("A", "8400"))
    nc = int(os.environ.get("NC", "80"))
    c = int(os.environ.get("C", "8"))
    pre_topk = int(os.environ.get("PRE_TOPK", "4096"))
    runs = int(os.environ.get("RUNS", "50"))

    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.uniform(0, 1, (b, a, nc)).astype(np.float32))
    sync(scores)

    @jax.jit
    def flat(s):
        cand = jnp.where(s > 0.001, s, -1.0).reshape(b, a * nc)
        return _exact_topk(cand, pre_topk)

    @jax.jit
    def rowsort(s):
        cls_scores, cls_idx = lax.top_k(s, c)  # (B, A, c)
        cand = jnp.where(cls_scores > 0.001, cls_scores, -1.0).reshape(b, a * c)
        v, i = _exact_topk(cand, pre_topk)
        return v, i, cls_idx

    @jax.jit
    def itermax(s):
        cols = lax.broadcasted_iota(jnp.int32, (1, 1, nc), 2)
        vals, idxs = [], []
        cur = s
        for _ in range(c):
            i = jnp.argmax(cur, axis=-1)  # (B, A)
            vals.append(jnp.max(cur, axis=-1))
            idxs.append(i)
            cur = jnp.where(cols == i[..., None], -jnp.inf, cur)
        cls_scores = jnp.stack(vals, -1)  # (B, A, c)
        cls_idx = jnp.stack(idxs, -1)
        cand = jnp.where(cls_scores > 0.001, cls_scores, -1.0).reshape(b, a * c)
        v, i = _exact_topk(cand, pre_topk)
        return v, i, cls_idx

    for name, fn in [("flat", flat), ("rowsort", rowsort), ("itermax", itermax)]:
        t0 = time.perf_counter()
        ms = bench(fn, (scores,), runs)
        print(json.dumps({"impl": name, "B": b, "ms_per_batch": round(ms, 3),
                          "ms_per_image": round(ms / b, 4),
                          "compile_s": round(time.perf_counter() - t0 - ms * (runs * 3 + 4) / 1e3, 1)}), flush=True)

    # correctness cross-check: itermax == rowsort candidate sets (values)
    v1 = np.sort(np.asarray(rowsort(scores)[0]), axis=-1)
    v2 = np.sort(np.asarray(itermax(scores)[0]), axis=-1)
    print(json.dumps({"itermax_equals_rowsort_values": bool(np.allclose(v1, v2))}), flush=True)


if __name__ == "__main__":
    main()
