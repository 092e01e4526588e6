#!/usr/bin/env python
"""Headline benchmark: yolo11n end-to-end frames/sec/chip @ 640x640.

Measures the full pipeline on device — uint8 letterbox/normalize, bf16
forward, DFL decode, batched NMS — with real device synchronization,
warmup / timed runs per the reference's protocol (reference
benchmarks/speed_benchmark.py:34-39; its wall-clock timers never
synchronized — SURVEY.md §6).

Primary metric: yolo11n @ b32 (comparable across rounds). Weather-proofing
(VERDICT r2 #2): persistent compile cache on, the headline value is the
median of sustained windows (one tunnel hiccup shifts one window, not the
round), transient backend errors retry once, and extras run in
most-valuable-first order (m/int8 matrix, x int8 headline, then sweeps) so a
blown budget drops the least important rows first.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import glob
import json
import os
import re
import sys

TRANSIENT = ("INVALID_ARGUMENT", "InvalidArgument", "UNAVAILABLE", "DEADLINE", "INTERNAL", "RESOURCE_EXHAUSTED")


def _retry(fn, attempts=2):
    """Retry once on the tunnel's transient backend errors. INVALID_ARGUMENT
    is deliberately in the transient set: the axon tunnel emits spurious
    InvalidArgument on very large compiles (PERF_MATRIX notes) — the cost of
    one redundant re-run on a genuine bug beats losing a 15-minute row."""
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            if i + 1 < attempts and any(t in f"{type(e).__name__}: {e}" for t in TRANSIENT):
                continue
            raise


def main() -> None:
    import time

    from yolo_infer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax

    # a killed TPU client can wedge the chip claim for 20+ min, during which
    # backend init hangs then dies with UNAVAILABLE; the headline must
    # survive that window if the harness allows, so probe-and-wait before
    # the first real work (a failed init poisons the process, but init
    # itself can be retried until a backend materializes)
    for attempt in range(int(os.environ.get("BENCH_INIT_RETRIES", "3"))):
        try:
            jax.devices()
            break
        except RuntimeError as e:
            if "UNAVAILABLE" not in str(e) or attempt + 1 >= int(os.environ.get("BENCH_INIT_RETRIES", "3")):
                raise
            print(f"backend init unavailable (attempt {attempt + 1}), sleeping 300s", file=sys.stderr)
            time.sleep(300)

    from yolo_infer_tpu.core.model import YOLO11Model

    t_start = time.perf_counter()
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1200"))  # extras stop past this; the headline line ALWAYS prints

    size = os.environ.get("BENCH_SIZE", "n")
    imgsz = int(os.environ.get("BENCH_IMGSZ", "640"))
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    runs = int(os.environ.get("BENCH_RUNS", "100"))
    full = os.environ.get("BENCH_FULL", "1") == "1"

    model = YOLO11Model(f"yolo11{size}")
    profile_dir = os.environ.get("BENCH_PROFILE")  # set to a dir to capture a jax.profiler trace
    result = _retry(lambda: model.benchmark(imgsz=imgsz, batch=batch, runs=runs, warmup=10, profile_dir=profile_dir))
    fps = result["throughput_imgs_per_s"]

    extras = {
        "avg_ms": result["avg_time_s"] * 1e3,
        "std_ms": result["std_time_s"] * 1e3,  # across sustained windows
        "windows_ms": result.get("window_avgs_ms"),
        "compile_s": result["compile_time_s"],
        "backend": jax.default_backend(),
        "batch": batch,
        "imgsz": imgsz,
    }

    partial_path = os.environ.get("BENCH_PARTIAL", os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_PARTIAL.json"))

    def _checkpoint():
        # incremental record: a wedge/kill mid-extras must not lose the
        # already-measured rows (stdout stays ONE line for the driver)
        try:
            with open(partial_path, "w") as f:
                json.dump({"fps_headline": fps, **extras}, f)
        except OSError:
            pass

    def _try(name, fn):
        if time.perf_counter() - t_start > budget_s:
            extras.setdefault("extras_skipped_budget", []).append(name)
            return
        try:
            extras[name] = _retry(fn)
        except Exception as e:  # noqa: BLE001 — extras must not sink the headline
            extras[name + "_error"] = str(e)[:120]
        _checkpoint()

    _checkpoint()  # the headline survives even if the first extra wedges

    def _coco_gate():
        # Opportunistic official-weights gate (VERDICT r4 item 8): attempt
        # tools/fetch_and_verify.py --limit 32. Offline it probes for ~10 s
        # and reports {"status": "skipped_offline"}; the first NETWORKED
        # environment proves the 0.1 COCO gate with zero manual steps.
        # Runs as a CPU-only child (PYTHONPATH without the axon plugin) so a
        # second process never dials the TPU this process holds.
        import subprocess

        here_dir = os.path.dirname(os.path.abspath(__file__))
        env = dict(os.environ, PYTHONPATH=here_dir, JAX_PLATFORMS="cpu")
        # budget-aware bound: offline this exits in ~10 s; online (the case
        # it exists for) it may download + dual-stack val for minutes — cap
        # it so it cannot starve the prioritized extras below of the whole
        # extras budget (r5 code review)
        left = budget_s - (time.perf_counter() - t_start)
        cap = max(120, min(900, int(left * 0.4)))
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(here_dir, "tools", "fetch_and_verify.py"),
                 "--model", "yolo11n", "--limit", "32"],
                capture_output=True, text=True, timeout=cap, env=env)
            for line in reversed(proc.stdout.strip().splitlines()):
                try:
                    return json.loads(line)
                except json.JSONDecodeError:
                    continue
            return {"status": "no_json_output", "rc": proc.returncode,
                    "stderr": proc.stderr[-120:]}
        except subprocess.TimeoutExpired:
            return {"status": "timeout"}

    if os.environ.get("BENCH_COCO_GATE", "1") == "1":
        try:
            extras["coco_gate"] = _coco_gate()
        except Exception as e:  # noqa: BLE001
            extras["coco_gate"] = {"status": "error", "error": str(e)[:120]}
        _checkpoint()

    if full:
        # ---- extras, MOST VALUABLE FIRST (budget drops the tail, not these)

        def _m_numbers():
            m = YOLO11Model("yolo11m")
            r32 = m.benchmark(imgsz=imgsz, batch=32, runs=30, warmup=3)
            r128 = m.benchmark(imgsz=imgsz, batch=128, runs=15, warmup=3)
            out = {"m_fps_b32": round(r32["throughput_imgs_per_s"], 1),
                   "m_fps_b128": round(r128["throughput_imgs_per_s"], 1)}
            # int8 residency headline: yolo11m @ b128
            import numpy as np

            from yolo_infer_tpu.optimization.quantization.quantizers import PostTrainingQuantizer

            q = PostTrainingQuantizer(m, {"imgsz": imgsz})
            rng = np.random.default_rng(0)
            q.set_calibration_data([rng.integers(0, 255, (2, imgsz, imgsz, 3), dtype=np.uint8)])
            qm = q.optimize()
            ri = qm.benchmark(imgsz=imgsz, batch=128, runs=15, warmup=3)
            out["m_int8_fps_b128"] = round(ri["throughput_imgs_per_s"], 1)
            out["m_int8_speedup_b128"] = round(ri["throughput_imgs_per_s"] / r128["throughput_imgs_per_s"], 3)
            ri32 = qm.benchmark(imgsz=imgsz, batch=32, runs=30, warmup=3)
            out["m_int8_speedup_b32"] = round(ri32["throughput_imgs_per_s"] / r32["throughput_imgs_per_s"], 3)
            return out

        def _x_int8():
            # int8's headline: the HBM-bound regime (yolo11x b128 is slower
            # than b32 in bf16; int8 residency un-crosses the cliff — 1.72x)
            import numpy as np

            from yolo_infer_tpu.optimization.quantization.quantizers import PostTrainingQuantizer

            x = YOLO11Model("yolo11x")
            rb = x.benchmark(imgsz=imgsz, batch=128, runs=8, warmup=2)
            q = PostTrainingQuantizer(x, {"imgsz": imgsz})
            rng = np.random.default_rng(0)
            q.set_calibration_data([rng.integers(0, 255, (2, imgsz, imgsz, 3), dtype=np.uint8)])
            ri = q.optimize().benchmark(imgsz=imgsz, batch=128, runs=8, warmup=2)
            return {"x_fps_b128": round(rb["throughput_imgs_per_s"], 1),
                    "x_int8_fps_b128": round(ri["throughput_imgs_per_s"], 1),
                    "x_int8_speedup_b128": round(ri["throughput_imgs_per_s"] / rb["throughput_imgs_per_s"], 3)}

        if os.environ.get("BENCH_MATRIX", "1") == "1":
            _try("matrix", _m_numbers)
            if isinstance(extras.get("matrix"), dict):
                extras.update(extras.pop("matrix"))

        if os.environ.get("BENCH_X_INT8", "1") == "1":
            _try("x_int8", _x_int8)
            if isinstance(extras.get("x_int8"), dict):
                extras.update(extras.pop("x_int8"))

        def _seg():
            # seg serving with device-resident lazy masks (round 3): the full
            # process_mask(upsample=True) pipeline in-graph, Results.masks
            # stays on device until read (docs/ARCHITECTURE.md). The input
            # batch is placed on device ONCE, like the headline: re-uploading
            # 39 MB of uint8 per call through the axon tunnel measures tunnel
            # bandwidth (~23 img/s!), not the serving pipeline — on real TPU
            # hosts the PCIe upload overlaps compute (predict_many pipelines
            # it; tools/bench_seg_masks.py measures the e2e list path).
            import numpy as np

            import jax.numpy as jnp

            s = YOLO11Model(f"yolo11{size}-seg")
            p = s.predictor
            rng = np.random.default_rng(0)
            dev = jnp.asarray(rng.integers(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8))

            def once():
                dets = p.predict_raw(dev, 0.25, 0.45, imgsz)
                np.asarray(dets["num"])  # sync (masks stay device-resident)
                return dets

            for _ in range(3):
                once()
            n_runs = 10
            # sustained: queue the runs, sync once (headline convention — a
            # per-call sync adds one tunnel RTT per batch, a tunnel artifact)
            t0 = time.perf_counter()
            for _ in range(n_runs - 1):
                p.predict_raw(dev, 0.25, 0.45, imgsz)
            dets = once()
            lazy = batch / ((time.perf_counter() - t0) / n_runs)
            # the LazyMasks serving read, measured per image: one bounded
            # (k, imgsz, imgsz/8) packed transfer (random-init weights give
            # num=0 at serving conf, so read a FIXED 30-row budget — what a
            # typical trained-model scene materializes)
            k = 30
            np.asarray(dets["mask_bits_up"][0, :k])
            reads = []
            for i in range(5):
                t0 = time.perf_counter()
                np.asarray(dets["mask_bits_up"][i % batch, :k])
                reads.append(time.perf_counter() - t0)
            return {"seg_fps": round(lazy, 1),
                    "seg_mask_read_ms_per_image_30rows": round(sorted(reads)[2] * 1e3, 1)}

        if os.environ.get("BENCH_SEG", "1") == "1":
            _try("seg", _seg)
            if isinstance(extras.get("seg"), dict):
                extras.update(extras.pop("seg"))

        def _pose():
            # pose serving (round 4: select-then-decode kpt tail + chunked
            # scan subgraphs took n/b32 16.9 -> 11.85 ms; PERF_MATRIX
            # serving_pose rows)
            p = YOLO11Model(f"yolo11{size}-pose")
            r = p.benchmark(imgsz=imgsz, batch=batch, runs=max(runs // 2, 20), warmup=3)
            return round(r["throughput_imgs_per_s"], 1)

        if os.environ.get("BENCH_POSE", "1") == "1":
            _try("pose_fps", _pose)

        big_batch = int(os.environ.get("BENCH_BIG_BATCH", "128"))
        _try("fps_b%d" % big_batch, lambda: round(
            model.benchmark(imgsz=imgsz, batch=big_batch, runs=max(runs // 4, 10), warmup=3)["throughput_imgs_per_s"], 1))
        _try("b1_device_ms", lambda: round(
            model.benchmark(imgsz=imgsz, batch=1, runs=50, warmup=5)["avg_time_s"] * 1e3, 2))

        def _slim():
            # physical channel surgery (optimization/surgery.py): keep 0.5 of
            # every internal group -> ~40% of weights gone, genuinely smaller
            # compiled program. Speedup vs the dense headline above.
            from yolo_infer_tpu.optimization.surgery import slim_model

            sp, _, _, rep = slim_model(model.deploy_params, None, model.spec, keep_frac=0.5)
            slim = YOLO11Model.from_params(sp, task="detect", size=size, nc=80, fused=True,
                                           model_path=f"yolo11{size}-slim")
            r = slim.benchmark(imgsz=imgsz, batch=batch, runs=max(runs // 2, 20), warmup=5)
            return {"slim_fps": round(r["throughput_imgs_per_s"], 1),
                    "slim_speedup": round(r["throughput_imgs_per_s"] / fps, 3),
                    "slim_params_ratio": round(rep["params_ratio"], 3)}

        if os.environ.get("BENCH_SLIM", "1") == "1":
            _try("slim", _slim)
            if isinstance(extras.get("slim"), dict):
                extras.update(extras.pop("slim"))

        def _slim_int8():
            # the levers stack: physical surgery (keep 0.5) + static8 PTQ at
            # the HBM-bound regime (yolo11x @ b128) — the framework's best
            # single number vs dense bf16 (tools/bench_slim_int8.py protocol)
            import numpy as np

            from yolo_infer_tpu.optimization.quantization.quantizers import PostTrainingQuantizer
            from yolo_infer_tpu.optimization.surgery import slim_model

            x = YOLO11Model("yolo11x")
            sp, _, _, _rep = slim_model(x.deploy_params, None, x.spec, keep_frac=0.5)
            xs = YOLO11Model.from_params(sp, task="detect", size="x", nc=80, fused=True,
                                         model_path="yolo11x-slim")
            q = PostTrainingQuantizer(xs, {"imgsz": imgsz})
            rng = np.random.default_rng(0)
            q.set_calibration_data([rng.integers(0, 255, (2, imgsz, imgsz, 3), dtype=np.uint8)])
            r = q.optimize().benchmark(imgsz=imgsz, batch=128, runs=8, warmup=2)
            out = {"x_slim_int8_fps_b128": round(r["throughput_imgs_per_s"], 1)}
            dense = extras.get("x_fps_b128")
            if isinstance(dense, (int, float)) and dense:
                out["x_slim_int8_vs_dense_bf16"] = round(r["throughput_imgs_per_s"] / dense, 3)
            return out

        if os.environ.get("BENCH_SLIM_INT8", "1") == "1":
            _try("slim_int8", _slim_int8)
            if isinstance(extras.get("slim_int8"), dict):
                extras.update(extras.pop("slim_int8"))

    # vs_baseline: ratio to the most recent recorded round, else 1.0
    prev = None
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json")), key=lambda p: int(re.search(r"r(\d+)", p).group(1))):
        try:
            data = json.loads(open(path).read())
            if isinstance(data, dict) and "parsed" in data and isinstance(data["parsed"], dict):
                data = data["parsed"]  # driver wraps the bench line under "parsed"
            if isinstance(data, dict) and "value" in data:
                prev = float(data["value"])
        except Exception:
            pass
    vs = fps / prev if prev else 1.0

    print(json.dumps({
        "metric": f"yolo11{size}_{imgsz}_b{batch}_e2e_fps_per_chip",
        "value": round(fps, 2),
        "unit": "imgs/s",
        "vs_baseline": round(vs, 4),
        **extras,
    }))


if __name__ == "__main__":
    sys.exit(main())
