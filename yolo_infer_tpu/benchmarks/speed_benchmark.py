"""SpeedBenchmark — latency/throughput/quantization sweeps.

API parity with the reference SpeedBenchmark (reference benchmarks/
speed_benchmark.py: warmup=10/runs=100 :34-39, benchmark_model_sizes :61-122,
benchmark_quantization :124-209, benchmark_throughput :211-305,
_benchmark_inference :307-350, report generation :370-422, CLI :425-514).
Unlike the reference's unsynchronized wall-clock timers (SURVEY.md §6), every
measurement here forces real device completion (see YOLO11Model.benchmark).
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np

from yolo_infer_tpu.core.model import YOLO11Model
from yolo_infer_tpu.utils.helpers import ResourceMonitor, format_time

logger = logging.getLogger(__name__)


class SpeedBenchmark:
    """Inference performance measurement harness."""

    def __init__(
        self,
        output_dir: Union[str, Path] = "benchmark_results",
        warmup_runs: int = 10,
        benchmark_runs: int = 100,
        device: Optional[str] = None,
    ):
        self.output_dir = Path(output_dir)
        self.warmup_runs = warmup_runs
        self.benchmark_runs = benchmark_runs
        self.device = device
        self.results: Dict[str, Any] = {}

    # ------------------------------------------------------------- model sweep

    def benchmark_model_sizes(
        self,
        model_sizes: Sequence[str] = ("n", "s", "m"),
        image_sizes: Sequence[int] = (320, 640),
        batch_sizes: Sequence[int] = (1, 8, 32),
    ) -> Dict[str, Any]:
        """Sweep size x imgsz x batch (reference speed_benchmark.py:61-122)."""
        results: Dict[str, Any] = {}
        for size in model_sizes:
            model = YOLO11Model(f"yolo11{size}", device=self.device)
            for imgsz in image_sizes:
                for batch in batch_sizes:
                    key = f"yolo11{size}_imgsz{imgsz}_batch{batch}"
                    logger.info("benchmarking %s", key)
                    try:
                        r = model.benchmark(imgsz=imgsz, batch=batch, runs=self.benchmark_runs, warmup=self.warmup_runs)
                        results[key] = r
                        logger.info("%s: %.1f imgs/s", key, r["throughput_imgs_per_s"])
                    except Exception as e:  # noqa: BLE001 — sweep survives OOM configs
                        logger.warning("%s failed: %s", key, e)
                        results[key] = {"error": str(e)}
        self.results["model_sizes"] = results
        self._save_json("model_sizes_benchmark.json", results)
        return results

    # ----------------------------------------------------------- quantization

    def benchmark_quantization(
        self,
        model_size: str = "n",
        imgsz: int = 640,
        batch: int = 32,
        methods: Sequence[str] = ("dynamic", "ptq"),
    ) -> Dict[str, Any]:
        """bf16 baseline vs int8 quantized variants with speedup ratios
        (reference speed_benchmark.py:124-209)."""
        from yolo_infer_tpu.optimization.quantization.quantizers import create_quantizer

        model = YOLO11Model(f"yolo11{model_size}", device=self.device)
        base = model.benchmark(imgsz=imgsz, batch=batch, runs=self.benchmark_runs, warmup=self.warmup_runs)
        results: Dict[str, Any] = {"fp_baseline": base}
        for method in methods:
            try:
                q = create_quantizer(method, model)
                if method == "ptq":
                    rng = np.random.default_rng(0)
                    calib = [rng.integers(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8) for _ in range(8)]
                    q.set_calibration_data(calib)
                qmodel = q.optimize()
                r = qmodel.benchmark(imgsz=imgsz, batch=batch, runs=self.benchmark_runs, warmup=self.warmup_runs)
                r["speedup"] = base["avg_time_s"] / r["avg_time_s"]
                results[method] = r
                logger.info("%s: %.2fx speedup", method, r["speedup"])
            except Exception as e:  # noqa: BLE001
                logger.warning("quantization %s failed: %s", method, e)
                results[method] = {"error": str(e)}
        self.results["quantization"] = results
        self._save_json("quantization_benchmark.json", results)
        return results

    # ------------------------------------------------------------- throughput

    def benchmark_throughput(
        self,
        model_size: str = "n",
        imgsz: int = 640,
        batch: int = 32,
        duration_s: float = 60.0,
    ) -> Dict[str, Any]:
        """Duration-bound sustained loop + resource telemetry
        (reference speed_benchmark.py:211-305)."""
        import jax.numpy as jnp

        model = YOLO11Model(f"yolo11{model_size}", device=self.device)
        predictor = model.predictor
        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.integers(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8))

        def sync(out):
            np.asarray(out["num"])

        sync(predictor.predict_raw(images, 0.25, 0.45, imgsz))  # compile
        monitor = ResourceMonitor(interval=1.0)
        monitor.start()
        n = 0
        t0 = time.perf_counter()
        out = None
        while time.perf_counter() - t0 < duration_s:
            out = predictor.predict_raw(images, 0.25, 0.45, imgsz)
            n += batch
            if n % (batch * 50) == 0:
                sync(out)  # bound queue depth
        if out is not None:
            sync(out)
        elapsed = time.perf_counter() - t0
        resources = monitor.stop()
        result = {
            "images_processed": n,
            "duration_s": elapsed,
            "throughput_imgs_per_s": n / elapsed,
            "resources": resources,
        }
        self.results["throughput"] = result
        self._save_json("throughput_benchmark.json", result)
        monitor.save(self.output_dir / "resource_history.json")
        return result

    # --------------------------------------------------------------- reports

    def generate_report(self) -> str:
        """Aggregate all benchmark JSONs into a text report
        (reference speed_benchmark.py:370-422)."""
        lines = ["YOLO11 TPU Benchmark Report", "=" * 50, ""]
        for path in sorted(self.output_dir.glob("*_benchmark.json")):
            lines.append(path.stem.replace("_", " ").title())
            lines.append("-" * 40)
            data = json.loads(path.read_text())
            lines.extend(self._fmt(data, indent=1))
            lines.append("")
        report = "\n".join(lines)
        (self.output_dir / "benchmark_report.txt").write_text(report)
        return report

    def _fmt(self, d: Dict[str, Any], indent: int = 0) -> List[str]:
        out = []
        for k, v in d.items():
            pad = "  " * indent
            if isinstance(v, dict):
                out.append(f"{pad}{k}:")
                out.extend(self._fmt(v, indent + 1))
            elif isinstance(v, float):
                out.append(f"{pad}{k}: {v:.4f}")
            else:
                out.append(f"{pad}{k}: {v}")
        return out

    def _save_json(self, name: str, data: Any) -> None:
        self.output_dir.mkdir(parents=True, exist_ok=True)
        (self.output_dir / name).write_text(json.dumps(data, indent=2, default=float))


def main(argv: Optional[List[str]] = None) -> int:
    """Standalone CLI (reference speed_benchmark.py:425-514)."""
    import argparse

    p = argparse.ArgumentParser(description="YOLO11 TPU speed benchmark")
    p.add_argument("--type", default="sizes", choices=["sizes", "quantization", "throughput", "all"])
    p.add_argument("--model-sizes", nargs="+", default=["n"], choices=list("nsmlx"))
    p.add_argument("--image-sizes", nargs="+", type=int, default=[640])
    p.add_argument("--batch-sizes", nargs="+", type=int, default=[1, 32])
    p.add_argument("--duration", type=float, default=30.0)
    p.add_argument("--runs", type=int, default=100)
    p.add_argument("--output-dir", default="benchmark_results")
    args = p.parse_args(argv)

    bench = SpeedBenchmark(output_dir=args.output_dir, benchmark_runs=args.runs)
    if args.type in ("sizes", "all"):
        bench.benchmark_model_sizes(args.model_sizes, args.image_sizes, args.batch_sizes)
    if args.type in ("quantization", "all"):
        bench.benchmark_quantization(args.model_sizes[0], args.image_sizes[0])
    if args.type in ("throughput", "all"):
        bench.benchmark_throughput(args.model_sizes[0], args.image_sizes[0], duration_s=args.duration)
    print(bench.generate_report())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
