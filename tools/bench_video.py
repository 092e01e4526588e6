"""End-to-end video pipeline throughput on TPU.

Synthesizes a short test video, runs DetectionDemo.detect_video (threaded
decode -> letterbox -> batched device upload -> jitted forward+NMS ->
draw/encode overlap) and reports wall-clock fps — the real user-facing
number for the reference's per-frame video loop rebuilt as a streaming
batched pipeline (SURVEY §7 step 8; reference demos/detection_demo.py:182-221
is synchronous batch=1).

Run detached: setsid nohup python tools/bench_video.py > /tmp/bench_video.log 2>&1 &
"""

import json
import time

from yolo_infer_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def row(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import cv2
    import jax
    import numpy as np

    for attempt in range(4):
        try:
            jax.devices()
            break
        except RuntimeError as e:
            if "UNAVAILABLE" not in str(e) or attempt == 3:
                raise
            row(event="init_unavailable", attempt=attempt)
            time.sleep(600)

    from yolo_infer_tpu.demos.detection_demo import DetectionDemo

    # synthetic 480p clip with moving rectangles (decode cost is real)
    src = "/tmp/bench_video_in.mp4"
    n_frames, w, h = 300, 854, 480
    wr = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    rng = np.random.default_rng(0)
    for i in range(n_frames):
        img = np.full((h, w, 3), 110, np.uint8)
        for j in range(4):
            x0 = int((i * (7 + j)) % (w - 120))
            y0 = int((i * (3 + j)) % (h - 120))
            cv2.rectangle(img, (x0, y0), (x0 + 100, y0 + 100),
                          tuple(int(c) for c in rng.integers(0, 255, 3)), -1)
        wr.write(img)
    wr.release()
    row(event="video_ready", frames=n_frames, res=f"{w}x{h}")

    row(backend=jax.default_backend(), event="start")
    # two regimes bracket the real cost: conf=0.25 on random weights draws ~0
    # boxes (draw-free ceiling); conf=1e-7 emits max_det boxes per frame so the
    # host draw/encode path is fully loaded (worst-case floor). conf is a
    # traced scalar, so the second regime costs no recompile. NB the detect
    # head's cls-bias init puts random-weight scores at ~1e-5 (the YOLO
    # log(5/nc/anchors) prior), so conf must sit BELOW that — the 2026-08-18
    # run used 1e-3 and its "max_draw" rows drew zero boxes.
    for conf, tag in ((0.25, "no_draw"), (1e-7, "max_draw")):
        demo = DetectionDemo(model_size="n", conf_threshold=conf)
        for batch in (8, 32):
            # warmup run compiles the signature; second run is the measurement
            demo.detect_video(src, output_path=None, batch_size=batch, max_frames=64)
            t0 = time.perf_counter()
            out = demo.detect_video(src, output_path="/tmp/bench_video_out.mp4", batch_size=batch)
            dt = time.perf_counter() - t0
            row(regime=tag, batch=batch, frames=out.get("total_frames", n_frames),
                fps=round(out.get("total_frames", n_frames) / dt, 1),
                wall_s=round(dt, 2),
                detections=out.get("total_detections"))
    row(event="done")


if __name__ == "__main__":
    main()
