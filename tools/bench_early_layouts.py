#!/usr/bin/env python
"""Layout experiments for the small-batch (b32) early-stage inefficiency.

The b32 HLO dump (tools/dump_hlo.py) shows XLA flip-flopping between three
layouts across layers 0-2: the convs pick a batch-in-lanes emitter — which
PADS batch 32 -> 128 lanes, 4x waste — while the elementwise/split/concat ops
sit in W-in-lanes or C-minor layouts, paying a full-tensor relayout copy at
every flip (~3 ms of copies + padded conv reads out of the 13.4 ms device
time). W-in-lanes has ZERO pad waste at P1/P2 (W = 320/160... multiples or
clean fractions of 128 after tiling) — and an NCHW-logical tensor gets
W-in-lanes as its NATURAL layout.

This benches the production NHWC chain vs an exact NCHW re-expression of
layers 0..L (same weights, transposed in/out), from the real u8 input,
terminated with a scalar sum (DCE-safe).

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_early_layouts.py
env: SIZE=n BATCHES=32,128 IMGSZ=640 RUNS=40 UPTO=2|4
"""

import json
import os
import sys
import time

import numpy as np


def sync_leaf(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def bench_fn(fn, args, runs):
    out = fn(*args)
    sync_leaf(out)
    for _ in range(3):
        out = fn(*args)
    sync_leaf(out)
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(runs):
            out = fn(*args)
        sync_leaf(out)
        reps.append((time.perf_counter() - t0) / runs)
    return float(np.median(reps)) * 1e3  # ms


def main():
    from yolo_infer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.models import blocks as B

    size = os.environ.get("SIZE", "n")
    batches = [int(b) for b in os.environ.get("BATCHES", "32,128").split(",")]
    imgsz = int(os.environ.get("IMGSZ", "640"))
    runs = int(os.environ.get("RUNS", "40"))
    upto = int(os.environ.get("UPTO", "4"))
    rng = np.random.default_rng(0)

    model = YOLO11Model(f"yolo11{size}")
    spec = model.spec
    params = model.deploy_params
    print(json.dumps({"device": str(jax.devices()[0]), "size": size, "upto": upto}), flush=True)

    def silu(x):
        return x * jax.nn.sigmoid(x)

    # ---- exact NCHW re-expression of the deploy conv/bottleneck/C3k2 ----
    def nchw_conv(p, x, stride=1, act=True):
        w = p["w"]  # HWIO
        k = w.shape[0]
        pd = k // 2
        y = lax.conv_general_dilated(
            x, w.astype(x.dtype), (stride, stride), ((pd, pd), (pd, pd)),
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
        )
        if "b" in p:
            y = y + p["b"].astype(y.dtype)[None, :, None, None]
        return silu(y) if act else y

    def nchw_bottleneck(p, x, add):
        y = nchw_conv(p["cv1"], x)
        y = nchw_conv(p["cv2"], y)
        return x + y if add else y

    def nchw_c3k2(p, x, shortcut):
        y0 = nchw_conv(p["cv1"], x)
        a, b = jnp.split(y0, 2, axis=1)
        ys = [a, b]
        for mp in p["m"]:
            ys.append(nchw_bottleneck(mp, ys[-1], add=shortcut))
        return nchw_conv(p["cv2"], jnp.concatenate(ys, axis=1))

    def nhwc_chain(x, upto):
        for layer in spec.layers:
            if layer.idx > upto:
                break
            key = str(layer.idx)
            if layer.typ == "Conv":
                x, _ = B.apply_conv(params[key], None, x, stride=layer.kw["stride"])
            elif layer.typ == "C3k2":
                x, _ = B.apply_c3k2(params[key], None, x, c3k=layer.kw["c3k"], shortcut=layer.kw["shortcut"])
            else:
                raise ValueError(layer.typ)
        return x

    def nchw_chain(x, upto):
        for layer in spec.layers:
            if layer.idx > upto:
                break
            key = str(layer.idx)
            if layer.typ == "Conv":
                x = nchw_conv(params[key], x, stride=layer.kw["stride"])
            elif layer.typ == "C3k2":
                if layer.kw["c3k"]:
                    raise ValueError("c3k blocks not supported in the NCHW probe")
                x = nchw_c3k2(params[key], x, shortcut=layer.kw["shortcut"])
            else:
                raise ValueError(layer.typ)
        return x

    for b in batches:
        images = jnp.asarray(rng.integers(0, 255, (b, imgsz, imgsz, 3), dtype=np.uint8))

        @jax.jit
        def f_nhwc(imgs):
            x = (imgs.astype(jnp.float32) * (1.0 / 255.0)).astype(jnp.bfloat16)
            return jnp.sum(nhwc_chain(x, upto).astype(jnp.float32))

        @jax.jit
        def f_nchw(imgs):
            x = (imgs.astype(jnp.float32) * (1.0 / 255.0)).astype(jnp.bfloat16)
            x = jnp.transpose(x, (0, 3, 1, 2))
            return jnp.sum(nchw_chain(x, upto).astype(jnp.float32))

        @jax.jit
        def f_nchw_to_nhwc(imgs):
            # the integration candidate: NCHW early stage, then hand the
            # P-level tensor back to the NHWC model in its layout
            x = (imgs.astype(jnp.float32) * (1.0 / 255.0)).astype(jnp.bfloat16)
            x = jnp.transpose(x, (0, 3, 1, 2))
            y = nchw_chain(x, upto)
            return jnp.sum(jnp.transpose(y, (0, 2, 3, 1)).astype(jnp.float32))

        # numeric parity check once per batch size (bf16 tolerance)
        ref = np.asarray(jax.jit(lambda im: nhwc_chain((im.astype(jnp.float32) / 255.0).astype(jnp.bfloat16), upto))(images[:2]), np.float32)
        got = np.asarray(jax.jit(lambda im: jnp.transpose(nchw_chain(jnp.transpose((im.astype(jnp.float32) / 255.0).astype(jnp.bfloat16), (0, 3, 1, 2)), upto), (0, 2, 3, 1)))(images[:2]), np.float32)
        err = float(np.abs(ref - got).max())
        row = {"size": size, "batch": b, "upto": upto, "max_abs_err": round(err, 5)}
        row["nhwc_ms"] = round(bench_fn(f_nhwc, (images,), runs), 3)
        row["nchw_ms"] = round(bench_fn(f_nchw, (images,), runs), 3)
        row["nchw_back_ms"] = round(bench_fn(f_nchw_to_nhwc, (images,), runs), 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    sys.exit(main())
