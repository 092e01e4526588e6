"""Jitted end-to-end prediction pipeline.

One compiled XLA program does: uint8 frames -> device letterbox/normalize ->
backbone/neck/head forward (bf16, MXU) -> DFL decode -> fixed-shape batched
NMS. The host only un-letterboxes the (max_det,) results — a few hundred
floats per image. This replaces the reference's predict path
(reference core/model.py:118-133 + ultralytics predictor) where letterbox
ran on host and NMS on torchvision.

Compilation is cached per (batch, source_hw, imgsz) signature; thresholds
conf/iou are traced scalars and never trigger recompiles.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from yolo_infer_tpu.models.spec import ModelSpec
from yolo_infer_tpu.models.yolo11 import forward
from yolo_infer_tpu.ops.decode import decode_detections, decode_keypoints, make_anchors
from yolo_infer_tpu.ops.letterbox import letterbox_params, scale_boxes
from yolo_infer_tpu.ops.nms import _multi_label_topc, batched_nms
from yolo_infer_tpu.ops.preprocess import preprocess_batch
from yolo_infer_tpu.utils.coco_names import COCO_NAMES


def _serve_chunk(batch: int, size: str, task: str, meshed: bool, quantized: bool,
                 imgsz: int = 640) -> Tuple[int, str]:
    """(sub-batch size, mode) for batch-chunked serving (0 = batch runs whole).

    At lane-starved batches XLA's layout assignment for the tiny-channel
    early convs flips to batch-in-lanes (pads batch -> 128 lanes) and inserts
    multi-MB relayout copies, so n/b32 ran 14.1 ms while the SAME pipeline at
    b16 ran 5.5 ms (hardware traces, models/early.py docstring). Running the
    batch as b16-shaped subgraphs inside ONE program inherits the fast
    layouts. v5e-1 @640 e2e A/B (2026-08-19, /tmp/ab_chunk*.log protocol):

      n/b32  detect  14.11 -> 10.87 ms unroll / 10.40 scan   (+30-36%);
             9.74 ms with the t=2 tiled early stage stacked inside the b16
             subgraphs (models/early.py) — the bench.py headline (3284.8
             img/s, vs_baseline 1.408)
      n/b64  detect  21.50 -> 20.20 unroll (scan 45.2 — loop bodies get
             their own layout roulette past 2 iterations: NOT a default)
      m/b32  detect  31.17 -> 29.81 unroll (scan 38.3 — scan only wins on n)
      n/b128 detect  base 21.5 is already lane-filled; chunking is 4x slower
      n/b32  seg/pose/cls: SCAN is 1.3-1.8x SLOWER than base (48.3/26.1/19.2
             vs 38.3/17.4/10.8) — scan re-rolls the loop body's layouts.
      n/b32  UNROLL A/B on the non-detect heads (ab_chunk3): obb 15.92 ->
             15.35 (+3.7%), cls 10.93 -> 10.47 (+4.4%), pose 17.15 -> 17.18
             (neutral), seg 38.25 -> 40.66 (-6%): obb/cls joined first.
      pose/seg re-A/B'd after the select-then-decode tail rewrite
             (ops/select.py onehot; the old full-grid decode + row gather
             was serializing the tail): pose whole 15.60 ms, chunk16-unroll
             12.14, scan 11.85 (2701 img/s, +30% over the round-3 17.15;
             pose shares detect's n-at-2-chunks scan preference, and m
             validates: 31.06 chunked vs 32.84 whole). seg's old -6%
             FLIPPED: whole 37.58, chunk16-unroll 35.86 (892 img/s) —
             both join the policy (tools/bench_rowsel.py 2026-08-19).
      m/b32  task validation (bench_chunk_tile_matrix TASK=...): obb 30.64
             chunked vs 32.91 whole (+7.4%), cls 19.77 vs 20.68 (+4.6%) —
             chunking holds; segment 55.38 chunked vs 54.99 whole (-0.7%,
             and the chunked seg program costs a 561 s compile vs 17 s) —
             segment chunks at n ONLY.

    The per-size A/B matrix (tools/bench_chunk_tile_matrix.py, v5e
    2026-08-19, default vs chunk-off vs chunk-without-tiling, detect @640):

      n/b64  20.31 / 21.66 / 40.35   -> chunked (tiling carries the win)
      s/b32  20.78 / 15.78 / 18.41   -> NOT chunked: 32% regression — s's
             channel widths already fill the b32 layouts; the subgraph
             split only adds copies
      m/b32  29.56 / 30.91 / 30.62   -> chunked
      l/b32  42.27 / 44.52 / 42.81   -> chunked
      x/b32  69.86 / 64.26 / 63.41   -> chunked WITHOUT the tiled early
             stage (models/early.py tiled_eligible excludes s/x)

    The policy is also imgsz-gated (the round-4 imgsz matrix caught a third
    silent loss in the imgsz-blind defaults, tools/bench_chunk_tile_matrix
    IMGSZ=320/1280 2026-08-19): n/b32 detect at 320 runs 3.97 ms WHOLE vs
    5.12 chunked (-29%), while 1280 chunks at +38% (45.24 vs 62.43 whole,
    with the tiled early stage inside the subgraphs carrying ~2x: 86.65
    without). Batches stay whole below 640.

    The round-4 b64/b96 matrix (tools/bench_chunk_tile_matrix.py, v5e
    2026-08-20, default vs chunk_off, detect @640) killed the blanket
    32<=B<128 gate — chunking LOSES everywhere past 2 chunks except n/b64:

      m/b64  58.79 chunked / 53.65 whole   -> whole (-9.6% chunked)
      l/b64  84.77 / 69.99                 -> whole (-21%)
      x/b64  127.99 / 118.49               -> whole (-8%)
      n/b96  30.60 / 19.85                 -> whole (-54%; 6 chunks = 6x
             relayout boundaries, the same more-chunks-lose shape as the
             chunk8 A/B)
      n/b64  20.31 / 21.66 (2026-08-19)    -> chunked (+6.6%, the tiled
             early stage carries it; chunk-without-tiling ran 40.35)

    The round-5 completion matrix (tools/bench_chunk_tile_matrix.py +
    bench_val_loop.py, v5e 2026-08-20) closed every previously unmeasured
    cell for B <= 128 at 640 (the r4 LESSON: always matrix the dial):

      n/b48  detect  18.83 whole / 17.45 chunk16   -> chunked (+7.9%; the
             3-chunk case wins like the 2- and 4-chunk n cells)
      n/b80  detect  19.97 / 27.05                 -> whole (5 chunks lose)
      n/b112 detect  22.04 / 36.77                 -> whole
      m/b48-112      42.2/68.5/81.1 whole all beat chunked (-7..-26%)
      n/b64  pose    24.85 / 24.18                 -> chunked (+2.7%)
      n/b64  obb     25.99 / 22.53                 -> chunked (+15%)
      n/b64  segment 68.72 / 71.91                 -> whole
      n/b64  classify 11.25 / 11.99                -> whole
      s/b32  refresh: whole 16.26, chunk16 18.81   -> s stays unchunked
             (post-tail-rewrite re-check; seldec helps s +2.7% instead)
      l/b32  refresh: 42.70 whole / 42.74 chunked  -> wash; keep chunked
      VAL program (conf=0.001 multi_label pre_topk=4096): the policy's
             chunking WINS for val too — b32 29.48 chunked vs 34.79 whole
             (+18%), b64 57.27 vs 62.15 (+8.5%); per-image ms is now
             monotone in batch (0.985/0.921/0.895 at b16/32/64).

    Policy: chunk 16 at B == 32 EXACTLY (2 chunks) — every task, sizes
    n/m/l/x (NOT s; segment additionally n only) at imgsz >= 640 — plus
    the directly measured n-only wins: detect b48/b64, pose b64, obb b64.
    Other cells stay whole: whole is never catastrophic, chunk losses are.
    "scan" only for the measured n-at-2-chunks detect/pose cases, "unroll"
    otherwise. Env overrides for sweeps: YOLO_TPU_SERVE_CHUNK=<n>
    (0 disables), YOLO_TPU_CHUNK_MODE=unroll|scan.
    Meshed serving keeps the batch whole (chunking would fight the GSPMD
    data-axis sharding); quantized trees keep their measured int8
    eligibility tables keyed on the full batch's activation rows
    (nn/quantize.py).
    """
    import os

    env = os.environ.get("YOLO_TPU_SERVE_CHUNK", "")
    mode_env = os.environ.get("YOLO_TPU_CHUNK_MODE", "")
    if env:
        return int(env), (mode_env or "unroll")
    if meshed or quantized:
        return 0, "unroll"
    if imgsz < 640:
        return 0, "unroll"
    if size == "s":
        return 0, "unroll"
    if task == "segment" and size != "n":
        return 0, "unroll"
    if batch == 32:
        mode = "scan" if (size == "n" and task in ("detect", "pose")) else "unroll"
        return 16, (mode_env or mode)
    if size == "n" and batch == 48:
        # the 3-chunk b48 cells win for EVERY task with scan (detect +7.9%
        # over whole / 15.09 vs 15.26 unroll; pose +12.7%; obb +20.9%;
        # classify +7.5%; segment +1.6% — measured, NOT inferred from the
        # b64 losses, which predicted seg/cls wrong); the scan collapse
        # only bites at 4+ chunks (n/b64 scan 45.2 vs 20.2 unroll, r4)
        return 16, (mode_env or "scan")
    if size == "n" and task in ("detect", "pose", "obb") and batch == 64:
        return 16, (mode_env or "unroll")
    return 0, "unroll"


def _serve_pre_topk(default: int) -> Optional[int]:
    """Explicit serving-pool override for hardware A/Bs
    (``YOLO_TPU_PRE_TOPK``), or None. An explicit value is honored AS IS —
    the caller's default cap (384/512) must not silently clamp a sweep's
    requested pool, or the emitted row is mislabeled (r5 code review)."""
    import os

    env = os.environ.get("YOLO_TPU_PRE_TOPK", "")
    return int(env) if env else None


def _trace_env_key() -> Tuple:
    """The trace-time env knobs baked into a compiled serving program.

    Part of the program-cache key (``Predictor._get``): flipping one of
    these on a LIVE predictor must re-trace, not silently serve the stale
    program compiled under the old value (r5 code review — the A/B tools
    use fresh models per variant, but a long-lived server toggling an env
    would otherwise record two identical rows under different labels)."""
    import os

    names = ("YOLO_TPU_SERVE_CHUNK", "YOLO_TPU_CHUNK_MODE", "YOLO_TPU_EARLY_TILED",
             "YOLO_TPU_EARLY_NCHW", "YOLO_TPU_TILE_T", "YOLO_TPU_DETECT_SELDEC",
             "YOLO_TPU_PRE_TOPK", "YOLO_MULTI_LABEL_TOPC", "YOLO_NMS_IMPL",
             "YOLO_TPU_ROWSEL", "YOLO_TOPK_IMPL")
    return tuple(os.environ.get(n, "") for n in names)


def _detect_seldec(meshed: bool) -> bool:
    """Whether the detect speed path uses select-then-decode
    (``YOLO_TPU_DETECT_SELDEC`` = 1/0 overrides). Default ON since the r5
    hardware A/B (tools/bench_chunk_tile_matrix.py seldec variants, v5e
    2026-08-20, quiet-host 40-run medians): it wins at every measured size —
    n/b32 10.19 -> 9.86 ms (+3.4%, +4.0% stacked with the K=384 pool),
    s/b32 16.26 -> 15.83, l/b32 42.70 -> 42.20. Never under a mesh: the
    one-hot row select has no natural GSPMD partitioning rule."""
    import os

    if meshed:
        return False
    env = os.environ.get("YOLO_TPU_DETECT_SELDEC", "")
    if env:
        return env == "1"
    return True


class DevScalarCache:
    """Device-resident threshold scalars, transferred ONCE per value.

    Building jnp.float32(conf) on every call ships a tiny host->device
    transfer per dispatch — ~2 ms/call through the remote tunnel, which
    dominated batch-1 latency (PERF_MATRIX.json round 2). Shared by the
    live Predictor and the AOT ExportedPredictor (core/exported.py)."""

    def __init__(self):
        self._cache: Dict[float, jnp.ndarray] = {}

    def __call__(self, v: float) -> jnp.ndarray:
        key = float(v)
        if key not in self._cache:
            self._cache[key] = jnp.float32(key)
        return self._cache[key]


@dataclass
class Results:
    """Per-image detection results in original-image pixel coordinates."""

    boxes: np.ndarray  # (n, 4) xyxy
    scores: np.ndarray  # (n,)
    classes: np.ndarray  # (n,) int32
    orig_shape: Tuple[int, int]  # (h, w)
    names: Dict[int, str] = field(default_factory=lambda: dict(COCO_NAMES))
    speed: Dict[str, float] = field(default_factory=dict)
    keypoints: Optional[np.ndarray] = None  # (n, K, 3) pose
    masks: Optional[Any] = None  # (n, H, W) segment — ndarray or LazyMasks
    probs: Optional[np.ndarray] = None  # (nc,) classify
    obb: Optional[np.ndarray] = None  # (n, 5) cx,cy,w,h,rad oriented boxes

    def __len__(self) -> int:
        return int(self.boxes.shape[0])


class LazyMasks:
    """Device-resident serving masks, materialized to numpy on first access.

    Holds a slice reference into the batch's bit-packed (B, max_det, grid,
    grid//8) uint8 device buffer (ops/masks.py assemble_mask_bits_up; grid
    is imgsz for mask_mode='device', imgsz//2 for 'device_half') and
    behaves like an (n, ch, cw) float32 array of BINARY {0, 1} masks — the
    ultralytics ``process_mask(upsample=True).gt_(0.5)`` serving semantic
    (note: the 'exact'/'q8' modes instead return SOFT sigmoid masks for
    callers that threshold themselves; see Predictor ``mask_mode``).
    This mirrors the reference, where ``Results.masks`` is a CUDA
    tensor that only hits the host when read: predict() never pays a mask
    transfer on the hot path, and at serving confidences the on-access
    transfer is a few hundred KB (n·imgsz²/8 bytes for the n real rows).

    The device buffer is shared by all Results of one batch and is released
    per-image on materialization; dropping the Results frees it.
    """

    def __init__(self, packed_dev, index: int, n: int, ratio: float, pad, orig_shape, imgsz: int):
        self._dev = packed_dev
        self._index = index
        self._n = n
        self._ratio, self._pad, self._orig_shape, self._imgsz = ratio, pad, orig_shape, imgsz
        # the buffer is self-describing: (B, max_det, grid, grid//8).
        # grid == imgsz for mask_mode='device'; imgsz//2 for 'device_half'
        # (host finishes with a 2x nearest upsample — <=1 px boundary error
        # for 4x less tunnel transfer).
        grid = int(packed_dev.shape[2])
        if imgsz % grid:
            raise ValueError(f"mask grid {grid} does not divide imgsz {imgsz}")
        self._scale = imgsz // grid
        self._np: Optional[np.ndarray] = None

    def _crop_window(self):
        """(gy0, gh, xb0, xb1, trim): device fetch window in GRID rows /
        byte-columns covering the letterbox content band, plus the full-res
        ``trim = (r0, ch, c0, cw)`` applied on host after unpack (+ nearest
        upsample when grid < imgsz)."""
        from yolo_infer_tpu.ops.letterbox import crop_letterbox_slices

        y0, x0, ch, cw = crop_letterbox_slices(self._ratio, self._pad, self._orig_shape, downsample=1)
        ch = min(ch, self._imgsz - y0)
        cw = min(cw, self._imgsz - x0)
        s = self._scale
        gy0 = y0 // s
        gh = -(-(y0 + ch) // s) - gy0
        gx0 = x0 // s
        gx1 = -(-(x0 + cw) // s)
        xb0, xb1 = gx0 // 8, -(-gx1 // 8)
        return gy0, gh, xb0, xb1, (y0 - gy0 * s, ch, x0 - xb0 * 8 * s, cw)

    def _finish(self, packed: np.ndarray, trim, dtype=np.float32) -> None:
        """Unpack a fetched (n, gh, bytes) slice, upsample to full res if the
        grid is coarser, and finalize the crop. The upsample happens in the
        PACKED bit domain (ops/masks.py repeat_mask_bits: a 256-entry LUT on
        the 32x-smaller bytes) so the full-res boolean image is built exactly
        once, by the single unpackbits."""
        from yolo_infer_tpu.ops.masks import repeat_mask_bits, unpack_mask_bits

        m = unpack_mask_bits(repeat_mask_bits(packed, self._scale))
        r0, ch, c0, cw = trim
        self._np = np.ascontiguousarray(m[:, r0: r0 + ch, c0: c0 + cw].astype(dtype, copy=False))
        self._dev = None  # release this image's hold on the device buffer

    def numpy(self, dtype=np.float32) -> np.ndarray:
        """Transfer the content band of the n real rows + unpack bits.

        Only the letterbox CONTENT region crosses the wire: rows outside
        the content band and byte-columns outside the padded width window
        are sliced off on device before the fetch (the crop bounds are
        host-known — VERDICT r3 #2; a 480p image in a 640 grid skips ~44%
        of the bytes). Bit-unpack is one vectorized np.unpackbits.

        ``dtype=np.uint8`` skips the float32 cast (these are {0,1} binary
        masks; a 30-mask 640-grid read spends ~25 ms of host time widening
        12 MB of uint8 to 48 MB of f32 — drawing/contour consumers don't
        need it). The first read's dtype is cached for later accesses."""
        if self._np is None:
            gy0, gh, xb0, xb1, trim = self._crop_window()
            packed = np.asarray(self._dev[self._index, : self._n, gy0: gy0 + gh, xb0:xb1])
            self._finish(packed, trim, dtype)
        return self._np

    @staticmethod
    def prefetch(items, dtype=np.float32) -> None:
        """Materialize many LazyMasks with ONE device transfer per shared
        batch buffer.

        Through a remote-TPU tunnel every fetch pays a full round-trip;
        reading a 32-image batch mask-by-mask pays it 32 times. This slices
        all pending images of each batch buffer in a single CONTIGUOUS
        transfer (bounding image range, union content band, max row count)
        and distributes the bytes on host. Contiguity matters: an
        advanced-index ``dev[idx, ...]`` lowers to a TPU gather, which runs
        ~30x slower than the basic slice on this buffer (scalar-gather trap,
        measured in tools/bench_mask_read_split.py) — so when the pending
        images cover less than half of their bounding range, the wasted
        slice bytes would beat the gather anyway and we fall back to
        per-image reads instead. `items` may be Results objects (``.masks``
        read) or LazyMasks. Already-materialized / non-lazy entries are
        skipped.
        """
        pending: List[LazyMasks] = []
        for it in items:
            m = it.masks if hasattr(it, "masks") else it
            if isinstance(m, LazyMasks) and m._np is None and m._dev is not None:
                pending.append(m)
        groups: Dict[int, List[LazyMasks]] = {}
        for m in pending:
            groups.setdefault(id(m._dev), []).append(m)
        for ms in groups.values():
            dev = ms[0]._dev
            ms.sort(key=lambda m: m._index)
            i0, i1 = ms[0]._index, ms[-1]._index + 1
            if len(ms) * 2 <= i1 - i0:
                for m in ms:  # sparse: bounding-range slice wastes >2x bytes
                    m.numpy(dtype)
                continue
            wins = [m._crop_window() for m in ms]
            max_n = max(max(m._n for m in ms), 1)
            uy0 = min(w[0] for w in wins)
            uy1 = max(w[0] + w[1] for w in wins)
            uxb0 = min(w[2] for w in wins)
            uxb1 = max(w[3] for w in wins)
            block = np.asarray(dev[i0:i1, :max_n, uy0:uy1, uxb0:uxb1])  # one fetch
            for m, (gy0, gh, xb0, xb1, trim) in zip(ms, wins):
                sub = block[m._index - i0, : m._n, gy0 - uy0: gy0 - uy0 + gh, xb0 - uxb0: xb1 - uxb0]
                m._finish(sub, trim, dtype)

    # ---- cheap (non-materializing) introspection ----
    @property
    def shape(self):
        if self._np is not None:
            return self._np.shape
        from yolo_infer_tpu.ops.letterbox import crop_letterbox_slices

        y0, x0, ch, cw = crop_letterbox_slices(self._ratio, self._pad, self._orig_shape, downsample=1)
        return (self._n, min(ch, self._imgsz - y0), min(cw, self._imgsz - x0))

    @property
    def dtype(self):
        return np.float32

    @property
    def ndim(self) -> int:
        return 3

    def __len__(self) -> int:
        return self._n

    # ---- everything else behaves like the materialized ndarray ----
    def __array__(self, dtype=None, copy=None):
        a = self.numpy()
        return a.astype(dtype) if dtype is not None and dtype != a.dtype else a

    def __getitem__(self, item):
        return self.numpy()[item]

    def __iter__(self):
        return iter(self.numpy())

    def __getattr__(self, name):
        # Materialize ONLY for genuine ndarray API (.sum, .T, .astype, ...).
        # hasattr probes / duck-typing checks for non-ndarray attributes
        # (.cpu, .to, display hooks) must not silently pay the device
        # transfer just to raise afterwards (VERDICT r3 weak #2).
        if name.startswith("_") or not hasattr(np.ndarray, name):
            raise AttributeError(name)
        return getattr(self.numpy(), name)


for _op in ("__ge__", "__gt__", "__le__", "__lt__", "__eq__", "__ne__",
            "__add__", "__radd__", "__sub__", "__rsub__", "__mul__", "__rmul__"):
    def _lazy_delegate(self, other, _op=_op):
        return getattr(self.numpy(), _op)(other)

    setattr(LazyMasks, _op, _lazy_delegate)
del _op, _lazy_delegate


class Predictor:
    """Caches jitted end-to-end programs keyed by input signature."""

    def __init__(
        self,
        params: Any,
        spec: ModelSpec,
        *,
        compute_dtype=jnp.bfloat16,
        pre_topk: int = 1024,
        max_det: int = 300,
        names: Optional[Dict[int, str]] = None,
        quant_act_scales: Optional[jnp.ndarray] = None,  # static PTQ scales
        quant_min_channels: Optional[int] = None,  # static8 channel
        # eligibility override: None = measured default (QuantContext);
        # a huge value (e.g. 1 << 30) degenerates to WEIGHT-ONLY int8
        # (int8-stored weights dequantized to bf16 compute — halves weight
        # HBM traffic, the regime that matters at batch 1)
        mesh: Any = None,  # jax Mesh: shard inference batches over 'data'
        mask_mode: str = "device",  # segment masks:
        # "device": the whole ultralytics serving pipeline in-graph —
        #   sigmoid -> crop -> bilinear upsample to imgsz -> 0.5-threshold
        #   (process_mask(upsample=True).gt_(0.5) order, interpolation on
        #   the accelerator like the reference's F.interpolate), bit-packed;
        #   Results.masks is a LazyMasks view that stays on device until read
        # "device_half": the same in-graph pipeline, thresholded on the
        #   imgsz//2 grid; the host finishes with a 2x nearest upsample —
        #   <=1 px boundary error at full res for 4x less device->host
        #   transfer (the consumption floor through a remote tunnel is the
        #   TRANSFER, not the device work: PERF_MATRIX seg_mask_read row)
        # "q8": in-graph sigmoid+crop, uint8-quantized masks; host upsamples
        #   floats (same order within 1/510)
        # "bits": in-graph 0.5-threshold at proto res, bit-packed, host
        #   re-thresholds after upsample — 8x less transfer
        # "exact": host float path, no quantization (parity oracle)
        # Results.masks values: "device"/"bits" are BINARY {0,1} (the
        # ultralytics .gt_(0.5) serving semantic); "q8"/"exact" stay SOFT
        # sigmoid probabilities so callers can pick their own threshold.
        # predict_raw additionally accepts mask_out="none" (skip mask
        # assembly entirely — box-metric validation).
    ):
        self.params = params
        self.spec = spec
        self.compute_dtype = compute_dtype
        self.pre_topk = pre_topk
        self.max_det = max_det
        if mask_mode not in ("auto", "device", "device_half", "q8", "bits", "exact"):
            raise ValueError(
                f"mask_mode must be 'auto', 'device', 'device_half', 'q8', 'bits' or 'exact', got {mask_mode!r}"
            )
        self.mask_mode = mask_mode
        from yolo_infer_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache()  # second-process compiles load from disk
        self.names = names or dict(COCO_NAMES)
        self.quant_act_scales = quant_act_scales
        self.quant_min_channels = quant_min_channels
        self.mesh = mesh
        if mesh is not None:
            from yolo_infer_tpu.parallel.mesh import shard_params

            self.params = shard_params(self.params, mesh)
        self._cache: Dict[Tuple, Any] = {}
        self._dev_scalar = DevScalarCache()

    def _place_batch(self, images_u8: jnp.ndarray) -> jnp.ndarray:
        """Shard the batch over the mesh's data axis (multi-chip serving)."""
        if self.mesh is None:
            return images_u8
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(images_u8, NamedSharding(self.mesh, P("data")))

    def _forward(self, params, x, early_tiles=None):
        """Model forward, inside a static-quant context when PTQ scales exist."""
        from yolo_infer_tpu.nn.quantize import QuantContext, quant_context

        attn_impl = "xla" if self.mesh is not None else "auto"
        if self.quant_act_scales is not None:
            # (n, 2) in/out pairs -> int8-residency path; legacy (n,) -> static
            mode = "static8" if getattr(self.quant_act_scales, "ndim", 1) == 2 else "static"
            kw = {} if self.quant_min_channels is None else {"int8_min_channels": int(self.quant_min_channels)}
            with quant_context(QuantContext(mode, act_scales=self.quant_act_scales, **kw)):
                return forward(params, None, self.spec, x, compute_dtype=self.compute_dtype, attn_impl=attn_impl)
        return forward(params, None, self.spec, x, compute_dtype=self.compute_dtype, attn_impl=attn_impl,
                       early_tiles=early_tiles)

    # -- compiled program ---------------------------------------------------

    def _build(self, src_hw: Tuple[int, int], imgsz: int, multi_label: bool, max_det: int, pre_topk: int, mask_out: Optional[str] = None):
        spec = self.spec
        compute_dtype = self.compute_dtype

        def single(params, images_u8, conf, iou):
            # NB: tiling the RAW u8 frames here (convert fused per tile) was
            # tried and measured SLOWER than letting forward() tile the bf16
            # activations (12.6 vs 11.3 ms at n/b32): u8's (32,128) tiling
            # makes the slice/concat copies ~2x less efficient per byte than
            # the same copies on bf16. The early-tiled path therefore lives
            # entirely in models/yolo11.forward (models/early.py).
            x = preprocess_batch(images_u8, out_hw=(imgsz, imgsz), dtype=compute_dtype)
            out, _ = self._forward(params, x)
            extras: Dict[str, jnp.ndarray] = {}
            if spec.task == "classify":
                return {"probs": jax.nn.softmax(out["logits"], axis=-1)}
            if spec.task == "obb":
                from yolo_infer_tpu.ops.decode import decode_raw
                from yolo_infer_tpu.ops.rotated import batched_rotated_nms, dist2rbox

                b = out["angle"][0].shape[0]
                ang = jnp.concatenate([a.reshape(b, -1, a.shape[-1]) for a in out["angle"]], axis=1)
                angle = (jax.nn.sigmoid(ang.astype(jnp.float32)[..., 0]) - 0.25) * jnp.pi  # (B, A)
                dist, scores, ap, st = decode_raw(out["feats"], spec.nc, spec.reg_max, spec.strides)
                rb = dist2rbox(dist, angle, ap[None]) * st[None]  # (B, A, 4) px
                rboxes = jnp.concatenate([rb, angle[..., None]], axis=-1)  # (B, A, 5)
                return batched_rotated_nms(
                    rboxes, scores, conf, iou, pre_topk=pre_topk, max_det=max_det,
                    impl="xla" if self.mesh is not None else "auto",
                    # ultralytics runs OBB val with multi_label=True — honor
                    # the request instead of silently dropping to single-label
                    multi_label=multi_label, multi_label_topc=_multi_label_topc(),
                )
            if multi_label:
                boxes, scores = decode_detections(out["feats"], spec.nc, spec.reg_max, spec.strides)
                dets = batched_nms(
                    boxes, scores, conf, iou,
                    pre_topk=pre_topk, max_det=max_det, multi_label=True,
                    # per-anchor class cap before the 672k flat sort (the val
                    # program's dominant op) — host-read env so the value is
                    # baked per program, never stale-cached across env flips
                    multi_label_topc=_multi_label_topc(),
                )
            else:
                # speed path: per-level class reduction (no (B,A,nc) tensor),
                # bf16 DFL, single-label NMS with a smaller candidate pool
                impl = "xla" if self.mesh is not None else "auto"
                seldec = _detect_seldec(self.mesh is not None)
                # seldec's one-hot row-select cost is linear in the pool, so
                # it serves the smallest lane-aligned pool that still honors
                # the max_det=300 output contract (K=384; K=256 measured
                # only 0.6% faster and caps detections below the contract).
                # An explicit YOLO_TPU_PRE_TOPK sweep value bypasses the cap.
                serve_topk = _serve_pre_topk(pre_topk) or min(pre_topk, 384 if seldec else 512)
                if seldec:
                    # select-then-decode: DFL runs on the serve_topk selected
                    # rows only, not all A anchors (ops/nms.py
                    # batched_nms_seldec; the pose/seg tails already decode
                    # this way). Gated off under a mesh: the one-hot row
                    # select has no natural GSPMD partitioning.
                    from yolo_infer_tpu.ops.decode import decode_scores_raw
                    from yolo_infer_tpu.ops.nms import batched_nms_seldec

                    best, cls, dist_flat = decode_scores_raw(out["feats"], spec.nc, spec.reg_max)
                    dets = batched_nms_seldec(
                        dist_flat, best, cls, conf, iou,
                        feat_shapes=tuple((f.shape[1], f.shape[2]) for f in out["feats"]),
                        strides=tuple(spec.strides), reg_max=spec.reg_max,
                        pre_topk=serve_topk, max_det=max_det, impl=impl,
                    )
                else:
                    from yolo_infer_tpu.ops.decode import decode_for_nms
                    from yolo_infer_tpu.ops.nms import batched_nms_presel

                    boxes, best, cls = decode_for_nms(out["feats"], spec.nc, spec.reg_max, spec.strides)
                    # meshed serving keeps the GSPMD-partitionable XLA NMS;
                    # the single-chip path uses the fused Pallas keep kernel
                    # + exact ApproxTopK (ops/nms.py nms_keep_mask /
                    # _exact_topk)
                    dets = batched_nms_presel(
                        boxes, best, cls, conf, iou,
                        pre_topk=serve_topk, max_det=max_det, impl=impl,
                    )
            if spec.task == "pose":
                from yolo_infer_tpu.ops.select import select_anchor_rows

                b = out["kpts"][0].shape[0]
                kflat = jnp.concatenate([k.reshape(b, -1, k.shape[-1]) for k in out["kpts"]], axis=1)
                feat_shapes = [(f.shape[1], f.shape[2]) for f in out["feats"]]
                ap, st = make_anchors(feat_shapes, spec.strides)
                # select-then-decode: pull the max_det raw rows + their
                # anchor/stride table rows, decode only those (the full-grid
                # decode built (B, A, K, 3) f32 just to gather ~300 rows)
                sel = dets["anchor_idx"]  # (B, max_det)
                ksel = select_anchor_rows(kflat, sel)
                apst = select_anchor_rows(jnp.concatenate([ap, st], axis=-1), sel)
                dets["kpts"] = decode_keypoints(
                    ksel, apst[..., :2], apst[..., 2:], spec.kpt_shape
                )  # (B, max_det, K, 3)
            elif spec.task == "segment" and (mask_out or self.mask_mode) != "none":
                from yolo_infer_tpu.ops.select import select_anchor_rows

                b = out["mc"][0].shape[0]
                mc = jnp.concatenate([m.reshape(b, -1, m.shape[-1]) for m in out["mc"]], axis=1)
                coefs = select_anchor_rows(mc, dets["anchor_idx"])  # (B, max_det, nm)
                mmode = mask_out or self.mask_mode
                if mmode == "auto":
                    # resolution-gated opt-in: device_half at serving
                    # resolutions (>=512), exact full-grid below. Measured
                    # at production 640 (ACCURACY_MATRIX r5): IoU vs full
                    # 0.9847 mean, mask-mAP50 delta 0.0000 vs full / 0.0016
                    # vs torch; mAP50-95 vs the EXACT full-grid mask 0.0489
                    # (the <=1 px band flips 0.9/0.95-IoU matches when GT
                    # is the exact mask itself) — which is why 'auto' is
                    # NOT the default: 'device' stays the accuracy-first
                    # default, 'auto'/'device_half' are the 2x mask-read
                    # lever (38.8 vs 73.1 ms/img through the tunnel).
                    mmode = "device_half" if imgsz >= 512 else "device"
                if mmode in ("device", "device_half"):
                    from yolo_infer_tpu.ops.masks import assemble_mask_bits_up

                    # full serving pipeline on device (sigmoid, crop,
                    # bilinear upsample, threshold), bit-packed; stays
                    # device-resident until Results.masks is read.
                    # device_half thresholds on the imgsz//2 grid (4x less
                    # transfer; LazyMasks nearest-upsamples on read — the
                    # buffer's own grid size tells it which mode this is)
                    dets["mask_bits_up"] = assemble_mask_bits_up(
                        out["proto"].astype(jnp.float32), coefs, dets["boxes"], imgsz,
                        out_size=imgsz // 2 if mmode == "device_half" else None,
                    )
                elif mmode == "q8":
                    from yolo_infer_tpu.ops.masks import assemble_masks_q8

                    # in-graph sigmoid+crop, uint8 soft masks: 4x less
                    # transfer than f32 and no host matmul; host keeps the
                    # exact upsample-floats-then-threshold serving order
                    dets["mask_q8"] = assemble_masks_q8(
                        out["proto"].astype(jnp.float32), coefs, dets["boxes"], imgsz
                    )
                elif mmode == "bits":
                    from yolo_infer_tpu.ops.masks import assemble_mask_bits

                    # in-graph sigmoid+crop+threshold at proto res (the val
                    # comparison semantic), bit-packed: 32x less transfer
                    # than f32 masks and no host matmul (VERDICT r2 #5)
                    dets["mask_bits"] = assemble_mask_bits(
                        out["proto"].astype(jnp.float32), coefs, dets["boxes"], imgsz
                    )
                else:
                    dets["mask_coefs"] = coefs
                    dets["proto"] = out["proto"]
            return dets

        @jax.jit
        def run(params, images_u8, conf, iou):
            b = int(images_u8.shape[0])
            chunk, chunk_mode = _serve_chunk(b, spec.size, spec.task, self.mesh is not None, self.quant_act_scales is not None,
                                             imgsz=int(images_u8.shape[1]))
            if chunk and b > chunk and b % chunk == 0:
                # Batch-chunked serving: every per-image output (NMS dets,
                # masks, keypoints) is fixed-shape, so running the whole
                # pipeline on B/chunk sub-batches and concatenating along
                # batch is EXACTLY equivalent — and at lane-starved batches
                # (b32: XLA's batch-in-lanes early-conv layouts fill 32 of
                # 128 lanes and insert multi-MB relayout copies; see
                # models/early.py) the chunk-16 subgraphs get the measured
                # b16 program's layouts instead (5.5 ms/16 imgs vs
                # 14.1 ms/32 at n/640, /tmp A/B 2026-08-19).
                n = b // chunk
                if chunk_mode == "scan":
                    from jax import lax as _lax

                    stacked = _lax.map(
                        lambda im: single(params, im, conf, iou),
                        images_u8.reshape((n, chunk) + images_u8.shape[1:]),
                    )
                    return jax.tree_util.tree_map(lambda t: t.reshape((b,) + t.shape[2:]), stacked)
                parts = [single(params, images_u8[i * chunk : (i + 1) * chunk], conf, iou) for i in range(n)]
                return jax.tree_util.tree_map(lambda *ts: jnp.concatenate(ts, axis=0), *parts)
            return single(params, images_u8, conf, iou)

        return run

    def _get(self, batch: int, src_hw: Tuple[int, int], imgsz: int, multi_label: bool, max_det: int, pre_topk: Optional[int] = None, mask_out: Optional[str] = None):
        pre_topk = pre_topk or self.pre_topk
        # normalize so mask_out=None and an explicit mask_out == mask_mode hit
        # the SAME cache entry (a byte-identical program; a second remote
        # compile costs 10-90 s through the tunnel)
        mask_out = mask_out or self.mask_mode
        key = (batch, src_hw, imgsz, multi_label, max_det, pre_topk, mask_out, _trace_env_key())
        if key not in self._cache:
            self._cache[key] = self._build(src_hw, imgsz, multi_label, max_det, pre_topk, mask_out)
        return self._cache[key]

    # -- public API ----------------------------------------------------------

    def predict(
        self,
        images: Union[np.ndarray, Sequence[np.ndarray]],
        conf: float = 0.25,
        iou: float = 0.45,
        imgsz: int = 640,
        multi_label: bool = False,
        max_det: Optional[int] = None,
    ) -> List[Results]:
        """images: uint8 RGB HWC array(s). Returns one Results per image."""
        if not isinstance(images, np.ndarray) and len(images) == 0:
            return []  # empty directory / list
        single = isinstance(images, np.ndarray) and images.ndim == 3
        if single:
            images = [images]
        host_lb: Optional[List[Tuple[float, Tuple[float, float]]]] = None
        if isinstance(images, np.ndarray):
            batch_np = images
            shapes = [tuple(images.shape[1:3])] * images.shape[0]
        else:
            shapes = [tuple(im.shape[:2]) for im in images]
            if len(set(shapes)) != 1:
                # heterogeneous sizes: host-letterbox everything into the ONE
                # square (imgsz, imgsz) signature instead of compiling per
                # shape (remote compiles cost 10-90 s each); the device
                # letterbox then is an identity pass-through
                from yolo_infer_tpu.ops.letterbox import letterbox

                lb = [letterbox(im, imgsz) for im in images]
                batch_np = np.stack([l[0] for l in lb], axis=0)
                host_lb = [(l[1], l[2]) for l in lb]
                shapes_orig = shapes
                shapes = [(imgsz, imgsz)] * len(images)
            else:
                batch_np = np.stack(images, axis=0)

        md = max_det or self.max_det
        from yolo_infer_tpu.utils.helpers import device_busy

        t0 = time.perf_counter()
        run = self._get(batch_np.shape[0], shapes[0], imgsz, multi_label, md)
        with device_busy():  # duty-cycle telemetry (utils.helpers)
            dets = run(self.params, self._place_batch(jnp.asarray(batch_np)), self._dev_scalar(conf), self._dev_scalar(iou))
            dev_masks = dets.pop("mask_bits_up", None)  # stays on device (LazyMasks)
            dets = jax.tree_util.tree_map(lambda x: np.asarray(x) if x is not None else None, dets)
            if dev_masks is not None:
                dets["mask_bits_up"] = dev_masks
        dt = (time.perf_counter() - t0) * 1000
        orig_shapes = shapes_orig if host_lb is not None else shapes
        return self._postprocess(dets, orig_shapes, host_lb, imgsz, dt)

    def _postprocess(
        self,
        dets: Dict[str, np.ndarray],
        orig_shapes: List[Tuple[int, int]],
        host_lb: Optional[List[Tuple[float, Tuple[float, float]]]],
        imgsz: int,
        dt: float,
    ) -> List[Results]:
        """Host-side assembly of Results from a synced fixed-shape dets dict."""
        results: List[Results] = []
        batch_n = len(orig_shapes)
        shapes = [(imgsz, imgsz)] * batch_n if host_lb is not None else orig_shapes
        if self.spec.task == "classify":
            for i in range(batch_n):
                results.append(
                    Results(
                        boxes=np.zeros((0, 4), np.float32),
                        scores=np.zeros((0,), np.float32),
                        classes=np.zeros((0,), np.int32),
                        orig_shape=orig_shapes[i],
                        names=self.names,
                        probs=dets["probs"][i],
                        speed={"inference": dt / batch_n},
                    )
                )
            return results

        if host_lb is None:
            ratio0, pad0, _ = letterbox_params(shapes[0], imgsz)
        for i in range(batch_n):
            ratio, pad = host_lb[i] if host_lb is not None else (ratio0, pad0)
            shapes_i = orig_shapes[i]
            n = int(dets["num"][i])
            obb = None
            if dets["boxes"].shape[-1] == 5:  # oriented boxes
                from yolo_infer_tpu.ops.letterbox import scale_obb

                obb = scale_obb(dets["boxes"][i, :n], ratio, pad)
                boxes = _obb_to_xyxy(obb, shapes_i)
            else:
                boxes = scale_boxes(dets["boxes"][i, :n], ratio, pad, shapes_i)
            kpts = None
            if "kpts" in dets:
                kpts = dets["kpts"][i, :n].copy()  # (n, K, 3)
                kpts[..., 0] = (kpts[..., 0] - pad[0]) / ratio
                kpts[..., 1] = (kpts[..., 1] - pad[1]) / ratio
            masks = None
            if "mask_bits_up" in dets and n > 0:
                # device mode: masks are already final (upsampled, binary,
                # bit-packed) and stay on device until read
                masks = LazyMasks(dets["mask_bits_up"], i, n, ratio, pad, shapes_i, imgsz)
            elif "mask_q8" in dets and n > 0:
                from yolo_infer_tpu.ops.letterbox import crop_letterbox_masks

                # device mode: dequantize the n real soft masks, bilinear-
                # upsample the FLOATS to imgsz (ultralytics process_mask
                # upsample-then-threshold order; threshold is the caller's,
                # masks stay soft like the exact path)
                soft = dets["mask_q8"][i, :n].astype(np.float32) / 255.0
                chans = np.ascontiguousarray(soft.transpose(1, 2, 0))
                masks = _resize_instances(chans, imgsz).transpose(2, 0, 1)
                masks = crop_letterbox_masks(masks, ratio, pad, shapes_i, downsample=1)
            elif "mask_bits" in dets and n > 0:
                from yolo_infer_tpu.ops.letterbox import crop_letterbox_masks
                from yolo_infer_tpu.ops.masks import unpack_mask_bits

                # device mode: unpack the n real bit-packed binary masks,
                # bilinear-upsample to imgsz, re-threshold (ultralytics
                # upsamples floats then thresholds; on binary inputs the two
                # orders differ only on sub-pixel boundary cells)
                binm = unpack_mask_bits(dets["mask_bits"][i, :n]).astype(np.float32)
                chans = np.ascontiguousarray(binm.transpose(1, 2, 0))
                masks = (_resize_instances(chans, imgsz) > 0.5).astype(np.float32).transpose(2, 0, 1)
                masks = crop_letterbox_masks(masks, ratio, pad, shapes_i, downsample=1)
            elif "mask_coefs" in dets and n > 0:
                from yolo_infer_tpu.ops.letterbox import crop_letterbox_masks

                masks = _assemble_masks(
                    dets["proto"][i], dets["mask_coefs"][i, :n], dets["boxes"][i, :n], imgsz,
                    upsample=True,  # serving parity: ultralytics process_mask(upsample=True)
                )
                # drop the letterbox padding so mask aspect matches the
                # original image (drawing then only resizes)
                masks = crop_letterbox_masks(masks, ratio, pad, shapes_i, downsample=1)
            results.append(
                Results(
                    boxes=boxes,
                    scores=dets["scores"][i, :n],
                    classes=dets["classes"][i, :n].astype(np.int32),
                    orig_shape=shapes_i,
                    names=self.names,
                    keypoints=kpts,
                    masks=masks,
                    obb=obb,
                    speed={"inference": dt / batch_n},
                )
            )
        return results

    def predict_many(
        self,
        images: Sequence[np.ndarray],
        conf: float = 0.25,
        iou: float = 0.45,
        imgsz: int = 640,
        batch_size: int = 32,
        multi_label: bool = False,
        max_det: Optional[int] = None,
        pipeline_depth: int = 2,
    ) -> List[Results]:
        """Chunked, pipelined prediction over a large image list.

        One compiled (batch_size, ...) signature serves the whole list: the
        last chunk is padded by repetition and trimmed after. Up to
        `pipeline_depth` device batches stay in flight while the host
        postprocesses drained ones — upload, compute, and Results assembly
        overlap (the video demo's pipeline, generalized to the library
        surface; the reference's DataLoader loop is synchronous per batch).

        Note on `Results.speed`: each chunk's "inference" time is pipelined
        wall-clock (dispatch to drain), so it includes queue wait behind up
        to `pipeline_depth` in-flight chunks — it measures pipeline
        throughput, not single-batch latency (use `predict` for latency).
        """
        import collections

        if not images:
            return []
        shapes = [tuple(im.shape[:2]) for im in images]
        host_lb: Optional[List[Tuple[float, Tuple[float, float]]]] = None
        if len(set(shapes)) != 1:
            from yolo_infer_tpu.ops.letterbox import letterbox

            lb = [letterbox(im, imgsz) for im in images]
            images = [l[0] for l in lb]
            host_lb = [(l[1], l[2]) for l in lb]
            shapes_orig, shapes = shapes, [(imgsz, imgsz)] * len(lb)
        else:
            shapes_orig = shapes

        md = max_det or self.max_det
        n = len(images)
        run = self._get(batch_size, shapes[0], imgsz, multi_label, md)
        conf_d, iou_d = self._dev_scalar(conf), self._dev_scalar(iou)

        results: List[Results] = []
        pending: "collections.deque" = collections.deque()

        def drain_one():
            dets, lo, hi, t0 = pending.popleft()
            dev_masks = dets.pop("mask_bits_up", None)
            dets = jax.tree_util.tree_map(lambda x: np.asarray(x) if x is not None else None, dets)  # sync
            if dev_masks is not None:
                # bulk API: pull the packed masks to the host NOW, in ONE
                # bounded transfer (the :max(n) real rows), so no device
                # buffer stays pinned per chunk — a long run would exhaust
                # HBM otherwise. LazyMasks then unpacks lazily from the
                # host-packed array (8x smaller than unpacked); a per-image
                # device slice here would dispatch batch_size programs that
                # queue behind the in-flight next chunk.
                mx = int(dets["num"][: hi - lo].max(initial=0))
                dets["mask_bits_up"] = np.asarray(dev_masks[:, :mx]) if mx else None
                if dets["mask_bits_up"] is None:
                    del dets["mask_bits_up"]
            dt = (time.perf_counter() - t0) * 1000
            chunk_lb = host_lb[lo:hi] if host_lb is not None else None
            out = self._postprocess(dets, shapes_orig[lo:hi] + [shapes_orig[hi - 1]] * (batch_size - (hi - lo)),
                                    None if chunk_lb is None else chunk_lb + [chunk_lb[-1]] * (batch_size - (hi - lo)),
                                    imgsz, dt)
            results.extend(out[: hi - lo])

        for lo in range(0, n, batch_size):
            hi = min(lo + batch_size, n)
            chunk = list(images[lo:hi]) + [images[hi - 1]] * (batch_size - (hi - lo))
            t0 = time.perf_counter()
            dets = run(self.params, self._place_batch(jnp.asarray(np.stack(chunk))), conf_d, iou_d)
            pending.append((dets, lo, hi, t0))  # device runs while host drains
            if len(pending) >= pipeline_depth:
                drain_one()
        while pending:
            drain_one()
        return results

    def predict_raw(self, images_u8: jnp.ndarray, conf: float, iou: float, imgsz: int, *, multi_label=False, max_det=None, pre_topk=None, mask_out=None):
        """Device-resident variant: returns the raw fixed-shape dets dict (no host sync).

        `pre_topk` overrides the candidate cap before NMS (the validator
        raises it: at conf=0.001 x multi_label the above-threshold
        (anchor, class) pool can exceed the serving default). `mask_out`
        overrides the segment mask artifact ("q8" soft / "bits" binary /
        "exact" proto+coefs / "none" skip mask assembly entirely); the mask
        validator requests "bits" — binarize at proto res IS the val
        comparison semantic, at 8x less transfer — and box-metric-only
        loops request "none"."""
        md = max_det or self.max_det
        run = self._get(images_u8.shape[0], tuple(images_u8.shape[1:3]), imgsz, multi_label, md, pre_topk, mask_out)
        return run(self.params, self._place_batch(images_u8), self._dev_scalar(conf), self._dev_scalar(iou))


def _resize_instances(chans: np.ndarray, imgsz: int) -> np.ndarray:
    """Bilinear-resize (H, W, n) instance channels to (imgsz, imgsz, n).
    cv2.resize caps channels at CV_CN_MAX=512, so chunk the instances."""
    import cv2

    outs = []
    for i in range(0, chans.shape[-1], 512):
        up = cv2.resize(chans[..., i : i + 512], (imgsz, imgsz), interpolation=cv2.INTER_LINEAR)
        outs.append(up[..., None] if up.ndim == 2 else up)
    return outs[0] if len(outs) == 1 else np.concatenate(outs, axis=-1)


def _obb_to_xyxy(obb: np.ndarray, shape_hw) -> np.ndarray:
    """Axis-aligned envelope of rotated boxes (for .boxes compatibility)."""
    cx, cy, w, h, r = (obb[:, i] for i in range(5))
    cos, sin = np.abs(np.cos(r)), np.abs(np.sin(r))
    ex = (w * cos + h * sin) / 2
    ey = (w * sin + h * cos) / 2
    out = np.stack([cx - ex, cy - ey, cx + ex, cy + ey], axis=1)
    out[:, [0, 2]] = out[:, [0, 2]].clip(0, shape_hw[1])
    out[:, [1, 3]] = out[:, [1, 3]].clip(0, shape_hw[0])
    return out.astype(np.float32)


def _assemble_masks(
    proto: np.ndarray,
    coefs: np.ndarray,
    boxes_letterboxed: np.ndarray,
    imgsz: int,
    upsample: bool = False,
) -> np.ndarray:
    """sigmoid(proto @ coefs), cropped to each box at proto resolution, then
    optionally bilinearly upsampled to (imgsz, imgsz) — the exact order of
    ultralytics ops.process_mask(upsample=True), which the reference's
    serving path uses; validation compares at proto resolution (upsample
    False), matching ultralytics' val default.

    Host-side (n is small post-NMS); the matmul is (Hm*Wm, nm) x (nm, n).
    """
    hm, wm, nm = proto.shape
    logits = proto.reshape(-1, nm).astype(np.float32) @ coefs.astype(np.float32).T  # (Hm*Wm, n)
    m = 1.0 / (1.0 + np.exp(-logits))
    m = m.T.reshape(-1, hm, wm)
    # crop to boxes (boxes are in letterboxed pixels; proto grid is imgsz/4)
    scale = hm / imgsz
    ys = np.arange(hm)[None, :, None]
    xs = np.arange(wm)[None, None, :]
    b = boxes_letterboxed * scale
    keep = (xs >= b[:, 0, None, None]) & (xs < b[:, 2, None, None]) & (ys >= b[:, 1, None, None]) & (ys < b[:, 3, None, None])
    m = (m * keep).astype(np.float32)
    if upsample and len(m):
        chans = np.ascontiguousarray(m.transpose(1, 2, 0))  # (Hm, Wm, n)
        m = _resize_instances(chans, imgsz).transpose(2, 0, 1)
    return m
