#!/usr/bin/env python
"""Roofline accounting from XLA's own cost model (CPU-runnable, no TPU).

Per size/batch: FLOPs/img and bytes-accessed/img of the optimized HLO for
the deploy forward, plus the v5e-1 rooflines they imply (197 TFLOP/s bf16,
394 TOP/s int8, 819 GB/s HBM). Notes:
  * flops matches the published per-model figures (n 6.9 / s 22 / m 69 /
    l 88 / x 196 GF at 640) — a good MFU denominator.
  * "bytes accessed" is an HLO-level UPPER BOUND on HBM traffic (VMEM
    reuse inside fusions still counts), so measured img/s legitimately
    exceeds the naive bandwidth roofline; use it for *relative* traffic
    comparisons (e.g. dense vs slim), not absolute bandwidth claims.

Usage: JAX_PLATFORMS=cpu python tools/roofline.py [--sizes n m x] [--batch 32]
"""

import argparse
import json


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", nargs="+", default=["n", "s", "m", "l", "x"])
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--slim", action="store_true", help="also cost the keep-0.5 surgically slimmed tree")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from yolo_infer_tpu.models.yolo11 import build_model, cast_params, fold_model, forward

    PEAK_BF16, PEAK_HBM = 197e12, 819e9

    def cost(spec, dp, b):
        x = jnp.zeros((b, args.imgsz, args.imgsz, 3), jnp.bfloat16)
        f = jax.jit(lambda p, x: forward(p, None, spec, x, compute_dtype=jnp.bfloat16)[0])
        c = f.lower(dp, x).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return c["flops"] / b, c.get("bytes accessed", 0) / b

    for size in args.sizes:
        params, state, spec = build_model(jax.random.PRNGKey(0), "detect", size, 80)
        dp = cast_params(fold_model(params, state), jnp.bfloat16)
        fl, by = cost(spec, dp, args.batch)
        row = {"size": size, "batch": args.batch, "gflops_per_img": round(fl / 1e9, 2),
               "mb_per_img_hlo": round(by / 1e6, 1),
               "mxu_roofline_img_s": round(PEAK_BF16 / fl, 0),
               "hbm_upper_bound_img_s": round(PEAK_HBM / by, 0) if by else None}
        if args.slim:
            from yolo_infer_tpu.optimization.surgery import slim_model

            sp, _, _, rep = slim_model(dp, None, spec, keep_frac=0.5)
            sfl, sby = cost(spec, sp, args.batch)
            row.update(slim_gflops_per_img=round(sfl / 1e9, 2), slim_mb_per_img=round(sby / 1e6, 1),
                       slim_flops_ratio=round(sfl / fl, 3), slim_params_ratio=round(rep["params_ratio"], 3))
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
