#!/usr/bin/env python
"""Per-segment timing of the yolo11 forward on the real TPU.

Runs truncated prefixes of the layer DAG (output = sum of the live tensors so
nothing is dead-code-eliminated) and reports marginal time per segment. This
is the decomposition VERDICT round-1 weak #2 asked for at the layer level:
after the round-2 tail work, b128 yolo11n is ~73% forward — this shows where
inside the forward the time goes.

PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_forward.py
env: SIZE=n B=128 IMGSZ=640 PREFIXES=1,2,4,6,8,10,11,16,19,23
"""

import json
import os
import sys
import time

import numpy as np


def sync(x):
    import jax

    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def bench(fn, args, runs=20):
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
    from yolo_infer_tpu.models.spec import save_indices
    from yolo_infer_tpu.nn.layers import upsample2x

    size = os.environ.get("SIZE", "n")
    b = int(os.environ.get("B", "128"))
    imgsz = int(os.environ.get("IMGSZ", "640"))

    model = YOLO11Model(f"yolo11{size}")
    spec = model.spec
    params = model.deploy_params
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((b, imgsz, imgsz, 3)).astype(np.float32), jnp.bfloat16)

    def prefix_forward(params, x, upto):
        """forward() truncated after layer `upto`; returns scalar sum of live tensors."""
        keep = set(save_indices(spec))
        ys, prev = {}, x
        acc = jnp.float32(0)
        for layer in spec.layers:
            if layer.idx > upto:
                break
            t, key = layer.typ, str(layer.idx)
            if isinstance(layer.frm, tuple):
                inp = [prev if f == layer.idx - 1 else ys[f] for f in layer.frm]
            else:
                inp = prev if layer.frm == layer.idx - 1 or layer.idx == 0 else ys[layer.frm]
            if t == "Conv":
                y, _ = B.apply_conv(params[key], None, inp, stride=layer.kw["stride"], training=False)
            elif t == "C3k2":
                y, _ = B.apply_c3k2(params[key], None, inp, c3k=layer.kw["c3k"], shortcut=layer.kw["shortcut"], training=False)
            elif t == "SPPF":
                y, _ = B.apply_sppf(params[key], None, inp, k=layer.kw["k"], training=False)
            elif t == "C2PSA":
                y, _ = B.apply_c2psa(params[key], None, inp, training=False)
            elif t == "Upsample":
                y = upsample2x(inp)
            elif t == "Concat":
                y = jnp.concatenate(inp, axis=-1)
            elif t in ("Detect", "Segment", "Pose", "OBB"):
                feats, _ = B.apply_detect(params[key], None, inp, training=False)
                return acc + sum(jnp.sum(f.astype(jnp.float32)) for f in feats)
            else:
                raise ValueError(t)
            prev = y
            if layer.idx in keep:
                ys[layer.idx] = y
        return acc + jnp.sum(prev.astype(jnp.float32))

    prefixes = [int(p) for p in os.environ.get(
        "PREFIXES", ",".join(str(l.idx) for l in spec.layers)
    ).split(",")]
    res, prev_ms = [], 0.0
    for upto in prefixes:
        f = jax.jit(lambda p, x, u=upto: prefix_forward(p, x, u))
        t0 = time.perf_counter()
        ms = bench(f, (params, x0))
        compile_s = time.perf_counter() - t0
        layer = next(l for l in spec.layers if l.idx == upto)
        rec = {"upto": upto, "typ": layer.typ, "cum_ms": round(ms, 3),
               "marginal_ms": round(ms - prev_ms, 3), "compile_s": round(compile_s, 1)}
        prev_ms = ms
        res.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"size": size, "batch": b, "segments": res}))


if __name__ == "__main__":
    sys.exit(main())
