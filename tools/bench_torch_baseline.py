"""Measure the reference-stack CPU baseline the TPU numbers are judged against.

BASELINE.md's north-star is ">=3x fps/chip vs the fbgemm-quantized baseline",
but neither the reference (README is number-free) nor previous rounds ever
RECORDED that baseline. This tool produces it on the host CPU with the same
protocol the reference uses (reference benchmarks/speed_benchmark.py:34-39,
124-209: wall-clock around predict, warmup then timed runs, fp32 vs
dynamic-int8 with speedup = fp32_avg / int8_avg), driving the independent
in-repo torch implementation of the same architecture (tests/torch_ref.py —
the one converter parity is proven against).

Notes kept honest:
* torch.quantization.quantize_dynamic with fbgemm quantizes Linear-family
  modules only — a conv-dominated detector gets ~no dynamic-int8 speedup,
  which is faithfully what the reference's `dynamic` method delivers on YOLO
  (reference quantizers.py:349-353). Static PTQ conv-int8 in eager torch
  needs QuantStub surgery the reference also never performs on the YOLO
  graph (its PTQ path falls back, reference quantizers.py:179-220).
* Conv+BN are fused (torch.ao.quantization.fuse_modules) before timing,
  matching ultralytics' fuse-at-predict behavior.
* run counts are scaled down from 100 (CPU minutes, not TPU ms); the stats
  are means over >=5 timed runs after warmup.

Writes tools/../BASELINE_CPU.json and prints one JSON row per config.

Run (CPU-only; keep the TPU claim free):
  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/bench_torch_baseline.py
"""

import json
import os
import time


def row(**kw):
    print(json.dumps(kw), flush=True)
    return kw


def fuse_conv_bn(model):
    import torch

    for m in model.modules():
        names = dict(m.named_children())
        if "conv" in names and "bn" in names:
            torch.ao.quantization.fuse_modules(m, ["conv", "bn"], inplace=True)
    return model


def bench(model, batch, imgsz, warmup, runs):
    import torch

    x = torch.randn(batch, 3, imgsz, imgsz)
    with torch.no_grad():
        for _ in range(warmup):
            model(x)
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            model(x)
            times.append(time.perf_counter() - t0)
    avg = sum(times) / len(times)
    return {"avg_ms": round(avg * 1e3, 1), "imgs_per_s": round(batch / avg, 2)}


def main():
    import torch

    torch.backends.quantized.engine = "fbgemm"
    # use every core the host offers; on this image nproc=1, so the recorded
    # threads:1 is the environment's ceiling, not a handicap (ADVICE r3)
    torch.set_num_threads(os.cpu_count() or 1)
    from tests.torch_ref import TorchYOLO11

    from yolo_infer_tpu.models.spec import build_spec

    out = {"host": "cpu", "torch": torch.__version__,
           "cpu_count": os.cpu_count(),
           "threads": torch.get_num_threads(),
           "quant_engine": torch.backends.quantized.engine,
           "protocol": "reference speed_benchmark.py: wall-clock around forward, "
                       "warmup then timed runs; dynamic int8 = quantize_dynamic(fbgemm)",
           "configs": []}
    imgsz = 640
    for size, batches, runs in (("n", (1, 32), 8), ("m", (1, 8), 5)):
        model = TorchYOLO11(build_spec("detect", size)).eval()
        fuse_conv_bn(model)
        qmodel = torch.quantization.quantize_dynamic(model, dtype=torch.qint8)
        for b in batches:
            r32 = bench(model, b, imgsz, warmup=2, runs=runs)
            ri8 = bench(qmodel, b, imgsz, warmup=2, runs=runs)
            out["configs"].append(row(
                size=size, batch=b, imgsz=imgsz,
                fp32_imgs_per_s=r32["imgs_per_s"], fp32_avg_ms=r32["avg_ms"],
                int8dyn_imgs_per_s=ri8["imgs_per_s"], int8dyn_avg_ms=ri8["avg_ms"],
                int8dyn_speedup=round(r32["avg_ms"] / ri8["avg_ms"], 3)))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir, "BASELINE_CPU.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=1)
    row(event="done", path=os.path.abspath(path))


if __name__ == "__main__":
    main()
