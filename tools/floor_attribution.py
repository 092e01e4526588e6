#!/usr/bin/env python
"""Attainable-floor attribution for the n/b32 headline (VERDICT r4 item 1).

The round-4 device trace found NO dominant kernel in the 9.74 ms chunked
program (~556 ops averaging 8.5 us per b16 chunk, top op 381 us). This tool
quantifies how much of the remaining time is STRUCTURAL — i.e. bounded by
the MXU's 128-lane contraction geometry, not by fixable layout/fusion waste:

  * per-conv attainable time for the early stage (layers 0..2), where
    channel widths (3/16/32/64 at n) cap MXU utilization at
    (min(Ci,128)/128) x (min(Co,128)/128) of peak — a k3 conv with Ci=3
    cannot exceed ~2.3% MXU utilization NO MATTER the layout, kernel
    language, or fusion strategy (the contraction dim is Ci*k*k);
  * HBM-bound alternative per conv (activations in+out at 819 GB/s);
  * aggregate floor for the rest of the network at the measured deep-layer
    MFU ceiling (m/b128 reaches ~49% — used as the attainable reference);
  * comparison against the measured per-stage decomposition.

The conclusion this supports (with the r4 trace + the r3 Pallas-conv
negative result, ops/pallas/int8_conv.py): the early stage is lane-geometry
bound, so the remaining headroom at n/b32 is the gap between measured and
the channel-aware floor — NOT the naive 197 TFLOP/s roofline.

CPU-runnable: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/floor_attribution.py
env: SIZE=n BATCH=16 IMGSZ=640 (batch 16 = the chunked subgraph regime)
"""

import json
import os
import sys

PEAK_BF16 = 197e12  # v5e-1 bf16 MXU peak, FLOP/s
PEAK_HBM = 819e9  # v5e-1 HBM, B/s
DEEP_MFU = 0.49  # measured attainable MFU in the lane-filled regime (m/b128)


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from yolo_infer_tpu.models.yolo11 import build_model, cast_params, fold_model, forward

    size = os.environ.get("SIZE", "n")
    batch = int(os.environ.get("BATCH", "16"))
    imgsz = int(os.environ.get("IMGSZ", "640"))

    params, state, spec = build_model(jax.random.PRNGKey(0), "detect", size, 80)
    deploy = cast_params(fold_model(params, state), jnp.bfloat16)

    # ---- early stage (layers 0..2): enumerate its convs from the params tree
    def wshape(p):
        return tuple(p["w"].shape)  # (k, k, ci_per_group, co)

    l0, l1, l2 = deploy["0"], deploy["1"], deploy["2"]
    h1, h2 = imgsz // 2, imgsz // 4
    early = []
    k, _, ci, co = wshape(l0)
    early.append(("conv0", k, ci, co, h1))
    k, _, ci, co = wshape(l1)
    early.append(("conv1", k, ci, co, h2))
    k, _, ci, co = wshape(l2["cv1"])
    early.append(("c3k2.cv1", k, ci, co, h2))
    for i, mp in enumerate(l2["m"]):
        for cv in ("cv1", "cv2"):
            k, _, ci, co = wshape(mp[cv])
            early.append((f"c3k2.m{i}.{cv}", k, ci, co, h2))
    k, _, ci, co = wshape(l2["cv2"])
    early.append(("c3k2.cv2", k, ci, co, h2))

    rows = []
    early_floor_s = 0.0
    early_flops = 0.0
    for name, k, ci, co, hout in early:
        flops = 2.0 * batch * hout * hout * ci * co * k * k
        # MXU lane-geometry utilization bound: contraction dim = ci*k*k
        # (im2col view), output lanes = co. Both cap at 128.
        util = min(ci * k * k, 128) / 128.0 * min(co, 128) / 128.0
        t_mxu = flops / (PEAK_BF16 * util)
        # HBM bound: activation in (u8 for conv0, bf16 after) + out bf16;
        # stride-2 convs read the full 2x-resolution input once. Weights
        # are negligible at these sizes.
        hin = hout * 2 if name in ("conv0", "conv1") else hout
        elt_in = 1 if name == "conv0" else 2
        bytes_hbm = batch * (hin * hin * ci * elt_in + hout * hout * co * 2)
        t_hbm = bytes_hbm / PEAK_HBM
        t = max(t_mxu, t_hbm)
        early_floor_s += t
        early_flops += flops
        rows.append({"conv": name, "k": k, "ci": ci, "co": co, "hout": hout,
                     "gflop": round(flops / 1e9, 2), "mxu_util_bound": round(util, 4),
                     "floor_us": round(t * 1e6, 1),
                     "bound": "mxu" if t_mxu >= t_hbm else "hbm"})

    # ---- whole-net flops from XLA's cost model
    x = jnp.zeros((batch, imgsz, imgsz, 3), jnp.bfloat16)
    f = jax.jit(lambda p, xx: forward(p, None, spec, xx, compute_dtype=jnp.bfloat16)[0])
    c = f.lower(deploy, x).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    total_flops = float(c["flops"])
    rest_flops = total_flops - early_flops
    rest_floor_s = rest_flops / (PEAK_BF16 * DEEP_MFU)

    out = {
        "size": size, "batch": batch, "imgsz": imgsz,
        "early_convs": rows,
        "early_floor_ms": round(early_floor_s * 1e3, 3),
        "early_gflop": round(early_flops / 1e9, 2),
        "total_gflop": round(total_flops / 1e9, 2),
        "rest_floor_ms_at_deep_mfu": round(rest_floor_s * 1e3, 3),
        "attainable_floor_ms": round((early_floor_s + rest_floor_s) * 1e3, 3),
        "note": "early floor = per-conv max(MXU lane-geometry bound, HBM bound); "
                "rest at the measured deep-regime MFU (m/b128 ~49%). Excludes "
                "preprocess, decode/NMS tail, and inter-op gaps.",
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
