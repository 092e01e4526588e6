#!/usr/bin/env python
"""Dump the optimized (post-layout) HLO of the production e2e serving program.

The b32 device trace (tools/trace_ops.py) attributes ~24% of device time to
bare `copy.N` ops and ~10% to two big fusions — this maps those HLO op names
back to shapes and operands so the copies can be attacked at the source
(VERDICT r3 item 1: attribute the small-batch gap).

Writes the full optimized HLO text to $OUT (default /tmp/hlo_b{B}.txt) and
prints the definition line of every named op in $OPS (comma-separated), plus
the ten largest `copy` ops by output byte count.

PYTHONPATH=/root/repo:/root/.axon_site python tools/dump_hlo.py
env: SIZE=n BATCH=32 IMGSZ=640 OUT=/tmp/hlo_b32.txt OPS=fusion.644,copy.122
"""

import json
import os
import re
import sys


DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
               "pred": 1, "f16": 2, "s16": 2, "u16": 2, "s64": 8, "u64": 8}


def shape_bytes(shape_str: str) -> int:
    # e.g. "bf16[32,80,80,64]{3,2,1,0:T(8,128)(2,1)}" or tuple shapes
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main():
    from yolo_infer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_infer_tpu.core.model import YOLO11Model

    size = os.environ.get("SIZE", "n")
    batch = int(os.environ.get("BATCH", "32"))
    imgsz = int(os.environ.get("IMGSZ", "640"))
    out_path = os.environ.get("OUT", f"/tmp/hlo_b{batch}.txt")
    ops = [o for o in os.environ.get("OPS", "").split(",") if o]

    model = YOLO11Model(f"yolo11{size}")
    p = model.predictor
    fn = p._get(batch, (imgsz, imgsz), imgsz, False, 300)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8))
    lowered = fn.lower(p.params, images, jnp.float32(0.25), jnp.float32(0.45))
    compiled = lowered.compile()
    try:
        txt = compiled.as_text()
    except Exception as e:  # noqa: BLE001 — tunnel backends may not export HLO
        print(json.dumps({"error": f"as_text failed: {e}"[:300]}))
        return 1
    with open(out_path, "w") as f:
        f.write(txt)
    print(json.dumps({"out": out_path, "bytes": len(txt)}), flush=True)

    # definition lines of requested ops
    defs = {}
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = (.*)", line)
        if m:
            defs[m.group(1)] = m.group(2)
    for name in ops:
        print(json.dumps({"op": name, "def": defs.get(name, "<not found>")[:600]}), flush=True)

    # ten largest copies by output bytes
    copies = []
    for name, d in defs.items():
        if re.match(r"copy(\.\d+)?$", name) and d.startswith(("bf16", "f32", "s32", "u32", "s8", "u8", "pred", "(")):
            copies.append((shape_bytes(d.split(" copy(")[0]), name, d))
    copies.sort(reverse=True)
    for b, name, d in copies[:12]:
        print(json.dumps({"copy": name, "out_bytes": b, "def": d[:400]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
