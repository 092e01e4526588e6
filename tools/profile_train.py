#!/usr/bin/env python
"""Train-step performance attribution on the real TPU (VERDICT r2 #3).

The training analog of tools/profile_forward.py: times nested prefixes of the
training computation as separately-jitted programs and reports marginal cost
per stage, attributing the gap between inference throughput and training
throughput (reference hot loop: /root/reference/core/robust_trainer.py:381-456).

Stages (each includes everything above it):
  fwd        bf16 training-mode forward only (conv/BN stats/heads)
  loss       + TAL assign + CIoU/DFL/BCE losses (forward of the loss)
  grad       + backward (value_and_grad)                 <- fwd+bwd
  full       + global-norm clip, finite guard, optax update, EMA, donation

marginal(loss)  = assigner+loss forward
marginal(grad)  = the whole backward pass
marginal(full)  = optimizer + EMA + guards

PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_train.py
env: SIZE=n B=32 IMGSZ=640 RUNS=10 STAGES=fwd,loss,grad,full
"""

import json
import os
import sys
import time

import numpy as np


def sync(x):
    import jax

    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def bench(fn, args, runs):
    t0 = time.perf_counter()
    out = fn(*args)
    sync(out)
    compile_s = time.perf_counter() - t0  # first call only: trace+compile
    for _ in range(2):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / runs * 1e3, compile_s


def main():
    import jax
    import jax.numpy as jnp

    from yolo_infer_tpu.core.losses import DEFAULT_HYP, detection_loss
    from yolo_infer_tpu.core.train_step import init_train_state, make_train_step
    from yolo_infer_tpu.models.yolo11 import forward
    from yolo_infer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    size = os.environ.get("SIZE", "n")
    b = int(os.environ.get("B", "32"))
    imgsz = int(os.environ.get("IMGSZ", "640"))
    runs = int(os.environ.get("RUNS", "10"))
    stages = os.environ.get("STAGES", "fwd,loss,grad,full").split(",")

    ts = init_train_state(jax.random.PRNGKey(0), "detect", size, nc=80, imgsz=imgsz)
    spec, tx = ts.spec, ts.tx
    rng = np.random.default_rng(0)
    m = 32
    batch = {
        "images": jnp.asarray(rng.random((b, imgsz, imgsz, 3), np.float32)),
        "boxes": jnp.asarray(rng.uniform(0, imgsz, (b, m, 4)).astype(np.float32)),
        "classes": jnp.asarray(rng.integers(0, 80, (b, m)).astype(np.float32)),
        "mask": jnp.asarray(np.ones((b, m), np.float32)),
    }
    kw = dict(nc=spec.nc, reg_max=spec.reg_max, strides=spec.strides, hyp=DEFAULT_HYP)

    def fwd_only(params, bn, images):
        out, _ = forward(params, bn, spec, images, training=True, compute_dtype=jnp.bfloat16)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in out["feats"])

    def loss_only(params, bn, batch):
        out, _ = forward(params, bn, spec, batch["images"], training=True, compute_dtype=jnp.bfloat16)
        loss, _ = detection_loss(out["feats"], batch, **kw)
        return loss

    step = make_train_step(spec, tx)

    defs = {
        "fwd": (jax.jit(fwd_only), (ts.params, ts.bn_state, batch["images"])),
        "loss": (jax.jit(loss_only), (ts.params, ts.bn_state, batch)),
        "grad": (jax.jit(lambda p, s, bt: jax.value_and_grad(loss_only)(p, s, bt)), (ts.params, ts.bn_state, batch)),
    }

    res, prev = [], 0.0
    for name in stages:
        t0 = time.perf_counter()
        if name == "full":
            # the real step donates its input buffers — run it on a COPY so
            # stages listed after 'full' (STAGES order is caller-chosen)
            # still see live ts.params/bn_state
            st = ts.with_tree(jax.tree_util.tree_map(jnp.copy, ts.tree()))
            st, met = step(st, batch)
            sync(met)
            compile_s = time.perf_counter() - t0
            for _ in range(2):
                st, met = step(st, batch)
            sync(met)
            t0 = time.perf_counter()
            for _ in range(runs):
                st, met = step(st, batch)
            sync(met)
            ms = (time.perf_counter() - t0) / runs * 1e3
        else:
            fn, args = defs[name]
            ms, compile_s = bench(fn, args, runs)
        rec = {
            "stage": name, "cum_ms": round(ms, 2), "marginal_ms": round(ms - prev, 2),
            "imgs_per_s": round(b / ms * 1e3, 1), "compile_s": round(compile_s, 1),
        }
        prev = ms
        res.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"size": size, "batch": b, "imgsz": imgsz, "stages": res}))


if __name__ == "__main__":
    sys.exit(main())
