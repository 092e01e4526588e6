"""Device A/B: fused-qkv Pallas attention vs the XLA attention path.

The b32 device trace (tools/trace_ops.py, 2026-08-19) showed the XLA
attention path's head-major pack fusion at 1.47 ms and its f32 softmax
chain at ~1.6 ms per run — ~3 ms of an ~14 ms n/b32 e2e step. The fused
kernel (ops/pallas/attention_fused.attention_qkv_fused_pallas) consumes
the raw qkv-conv slab and keeps the score matrix VMEM-resident.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_attn_fused.py
Prints one JSON row per (model, batch, attn impl, early-tiling) variant.
"""

import json
import os

from yolo_infer_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from yolo_infer_tpu.core.model import YOLO11Model  # noqa: E402


def bench(m, batch, attn, tiled, t="", runs=40):
    os.environ["YOLO_ATTN_IMPL"] = attn
    os.environ["YOLO_TPU_EARLY_TILED"] = tiled
    os.environ["YOLO_TPU_TILE_T"] = t
    m._predictor = None
    r = m.benchmark(imgsz=640, batch=batch, runs=runs, warmup=5)
    return {"ms": round(r["avg_time_s"] * 1e3, 3), "fps": round(r["throughput_imgs_per_s"], 1)}


def main():
    n = YOLO11Model("yolo11n")
    rows = [
        # headline regime: attention impl x early tiling at n/b32
        ("n_b32_xla_untiled", n, 32, "xla", "0", "", 40),
        ("n_b32_fused_untiled", n, 32, "fused", "0", "", 40),
        ("n_b32_fused_t2", n, 32, "fused", "1", "2", 40),
        ("n_b16_fused_t2", n, 16, "fused", "1", "2", 40),
        ("n_b16_xla_t2", n, 16, "xla", "1", "2", 40),
        ("n_b8_fused_t2", n, 8, "fused", "1", "2", 40),
        # big-batch: the kernel must not regress the b128 row
        ("n_b128_xla", n, 128, "xla", "0", "", 15),
        ("n_b128_fused", n, 128, "fused", "0", "", 15),
    ]
    for tag, model, batch, attn, tiled, t, runs in rows:
        print(json.dumps({"tag": tag, **bench(model, batch, attn, tiled, t, runs)}), flush=True)
    m = YOLO11Model("yolo11m")
    for tag, batch, attn, tiled, t, runs in (
        ("m_b32_xla", 32, "xla", "0", "", 30),
        ("m_b32_fused", 32, "fused", "0", "", 30),
        ("m_b128_xla", 128, "xla", "0", "", 10),
        ("m_b128_fused", 128, "fused", "0", "", 10),
    ):
        print(json.dumps({"tag": tag, **bench(m, batch, attn, tiled, t, runs)}), flush=True)


if __name__ == "__main__":
    main()
