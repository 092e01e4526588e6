"""NCHW early-stage forward: the small-batch layout fix.

At batch 32 the NHWC early stage (layers 0-2: conv0 3->16 s2, conv1 16->32
s2, C3k2 P2) costs ~8.9 ms of the 12.9 ms yolo11n forward on v5e
(tools/profile_forward.py B=32): the tiny channel counts push XLA's layout
assignment into a batch-in-lanes conv emitter — which pads batch 32 -> 128
lanes, 4x wasted reads — while the surrounding elementwise/split/concat ops
choose W-minor or C-minor layouts, inserting a full-tensor relayout `copy` at
every flip (~3 ms of pure copies in the b32 device trace, tools/trace_ops.py
+ tools/dump_hlo.py).

Expressing the SAME math in NCHW gives every op W-in-lanes as its natural
layout (W = 640/320/160 tiles perfectly; C stays in the sublane-free major
dims), so XLA keeps one layout end-to-end and the copies vanish. The
preprocess output's chosen layout {2,1,3,0} is byte-identical to an NCHW
tensor's natural layout, so the entry transpose is a bitcast. Measured
(tools/bench_early_layouts.py): see PERF_MATRIX "early_nchw" rows.

Used by models/yolo11.forward for fused (deploy) float params in eval mode
with no active quantization context. Numerics are exactly equal to the NHWC
path (same convolutions, same order — verified to 0 ULP in the tool and
gated by tests/test_early_nchw.py).

Reference parity note: the reference delegates its conv stack to
torch/cuDNN, which does its own NCHW/NHWC layout selection internally
(reference core/model.py:118-133 predict path); this module is the
TPU-native analog of that layout freedom.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, Any]

# layers 0..EARLY_UPTO run in NCHW; chosen from the hardware A/B
# (tools/bench_early_layouts.py): the win lives in layers 0-2, while the
# P3-level layers are layout-neutral — but keeping them NCHW avoids an
# extra relayout boundary mid-backbone when it measures no slower.
EARLY_UPTO_DEFAULT = 2


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _conv(p: Params, x: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    """Fused-BN Conv+bias+SiLU on an NCHW activation (weights stay HWIO)."""
    w = p["w"]
    k = w.shape[0]
    pd = k // 2
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), ((pd, pd), (pd, pd)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)[None, :, None, None]
    return _silu(y)


def _bottleneck(p: Params, x: jnp.ndarray, add: bool) -> jnp.ndarray:
    y = _conv(p["cv2"], _conv(p["cv1"], x))
    return x + y if add else y


def _c3k2(p: Params, x: jnp.ndarray, shortcut: bool) -> jnp.ndarray:
    y0 = _conv(p["cv1"], x)
    a, b = jnp.split(y0, 2, axis=1)
    ys = [a, b]
    for mp in p["m"]:
        ys.append(_bottleneck(mp, ys[-1], add=shortcut))
    return _conv(p["cv2"], jnp.concatenate(ys, axis=1))


def early_halo(spec) -> int:
    """Input-pixel halo that makes quadrant tiling exact through layer 2.

    Radius at P2 = number of sequential 3x3 s1 convs in the C3k2 chain
    (each adds 1 px); pulled back through conv1 (k3 s2) and conv0 (k3 s2):
    halo = 4*r2 + 3, rounded up to a multiple of 4 so every tile start is
    stride-aligned (two stride-2 convs need offsets = 0 mod 4).
    """
    l2 = spec.layers[2]
    k3_per_rep = 4 if l2.kw["c3k"] else 2  # C3k holds two k3-k3 bottlenecks
    r2 = k3_per_rep * l2.kw.get("n", 1)
    h = 4 * r2 + 3
    return (h + 3) // 4 * 4


def _nhwc_chain(params: Params, spec, x: jnp.ndarray, upto: int):
    from yolo_infer_tpu.models import blocks as B

    for layer in spec.layers[: upto + 1]:
        key = str(layer.idx)
        if layer.typ == "Conv":
            x, _ = B.apply_conv(params[key], None, x, stride=layer.kw["stride"])
        else:
            x, _ = B.apply_c3k2(params[key], None, x, c3k=layer.kw["c3k"], shortcut=layer.kw["shortcut"])
    return x


def tiles_per_side(batch: int) -> int:
    """2x2 always: the hardware sweep (/tmp/ab_head protocol, v5e 2026-08-19)
    measured t=2 fastest at every eligible batch — b16 5.57 ms vs 7.45 at
    t=4, b8 4.52 vs 4.65 — i.e. half-filled lanes with small halos beat
    filled lanes with 4x the halo recompute. Overridable for A/B sweeps."""
    env = os.environ.get("YOLO_TPU_TILE_T", "")
    if env:
        return int(env)
    return 2


def tiled_eligible(params: Params, spec, batch: int, h: int, w: int) -> bool:
    """Tiling applies to straight-chain fused float early stages on
    stride-aligned inputs, in the deeply lane-starved batch regime
    (8 <= B <= 16 — where the batch-chunked serving policy lands its
    subgraphs). Measured at every other batch it is neutral or a loss:
    b32 whole 14.15 tiled vs 14.11 off, b64 whole 23.9 vs 21.65
    (/tmp/ab_head protocol, v5e 2026-08-19) — the native emitter's
    batch-in-lanes padding stops hurting once B fills more of the 128
    lanes, while the halo recompute stays."""
    if not (8 <= batch <= 16):
        return False
    # size gate, per-size chunk/tile A/B matrix (tools/bench_chunk_tile_matrix
    # v5e 2026-08-19): tiling inside the b16 chunk subgraphs carries the n
    # win (b64 20.3 vs 40.3 without it) and mildly helps m/l (29.6/42.3 vs
    # 30.6/42.8), but COSTS s and x (s 18.4 -> 20.8, x 63.4 -> 69.9): their
    # wider early channels already fill the lanes, leaving only the halo
    # recompute. YOLO_TPU_EARLY_TILED=force overrides the size gate for
    # sweeps ("0"/"1" keep their global off/default meaning in yolo11.py).
    if os.environ.get("YOLO_TPU_EARLY_TILED", "") != "force" and getattr(spec, "size", "") in ("s", "x"):
        return False
    t = tiles_per_side(batch)
    halo = early_halo(spec)
    ht, wt = h // t, w // t
    if h % t or w % t or ht % 4 or wt % 4:
        return False
    if h < ht + 2 * halo or w < wt + 2 * halo:
        return False
    return _chain_ok(params, spec, EARLY_UPTO_DEFAULT)


def _tile_grid(t: int, ht: int, halo: int, total: int):
    """Uniform overlapping tiles: (size, start offsets, interior offsets).

    Tile i wants [i*ht - halo, (i+1)*ht + halo); edge tiles shift inward so
    every tile has the same static size (the shifted extra halo lands in the
    discarded region). All offsets stay multiples of 4 (two stride-2 convs).
    """
    size = ht + 2 * halo
    starts, inner = [], []
    for i in range(t):
        s = min(max(i * ht - halo, 0), total - size)
        starts.append(s)
        inner.append(i * ht - s)
    return size, starts, inner


def build_tiles(x: jnp.ndarray, spec, t: int) -> jnp.ndarray:
    """Cut (B, H, W, C) into t*t uniform halo-padded tiles -> (t*t*B, hs, ws, C).

    Works on the RAW uint8 frames too — slicing commutes with the /255
    convert, and tiling before the convert halves the tile-build HBM traffic
    and lets XLA fuse the normalize into the per-tile conv input relayout
    instead of materializing a full-resolution bf16 tensor (the b32 trace
    showed that materialization costing ~1 ms, tools/trace_ops.py)."""
    b, h, w, _ = x.shape
    halo = early_halo(spec)
    ht, wt = h // t, w // t
    hs, hstarts, _ = _tile_grid(t, ht, halo, h)
    ws, wstarts, _ = _tile_grid(t, wt, halo, w)
    return jnp.concatenate(
        [x[:, s0 : s0 + hs, s1 : s1 + ws] for s0 in hstarts for s1 in wstarts], axis=0
    )


def run_early_from_tiles(
    params: Params, spec, tiles: jnp.ndarray, b: int, h: int, w: int,
    upto: int = EARLY_UPTO_DEFAULT,
) -> Tuple[jnp.ndarray, Dict[int, jnp.ndarray]]:
    """Early chain on prebuilt tiles (see run_early_tiled), stitched back to
    the (b, h/4, w/4, C) interior mosaic."""
    halo = early_halo(spec)
    t = tiles_per_side(b)
    ht, wt = h // t, w // t
    _, _, hin = _tile_grid(t, ht, halo, h)
    _, _, win = _tile_grid(t, wt, halo, w)
    y = _nhwc_chain(params, spec, tiles, upto)  # (t*t*B, hs/4, ws/4, C)
    rows = []
    for i in range(t):
        row = []
        for j in range(t):
            blk = y[(i * t + j) * b : (i * t + j + 1) * b]
            row.append(blk[:, hin[i] // 4 : (hin[i] + ht) // 4, win[j] // 4 : (win[j] + wt) // 4])
        rows.append(jnp.concatenate(row, axis=2) if t > 1 else row[0])
    out = jnp.concatenate(rows, axis=1) if t > 1 else rows[0]  # (B, h/4, w/4, C)
    from yolo_infer_tpu.models.spec import save_indices

    saved = {spec.layers[upto].idx: out} if spec.layers[upto].idx in set(save_indices(spec)) else {}
    return out, saved


def run_early_tiled(
    params: Params, spec, x: jnp.ndarray, upto: int = EARLY_UPTO_DEFAULT
) -> Tuple[jnp.ndarray, Dict[int, jnp.ndarray]]:
    """Layers 0..upto on t x t overlapping tiles: batch B -> t*t*B tiles.

    At b32 the XLA conv emitter for the tiny-channel early stage pads batch
    to 128 lanes (4x waste), making layers 0-2 cost nearly the same at b32
    as at b128 (tools/bench_early_layouts.py). Halo-padded tiles fill the
    lanes exactly; a halo >= the layer-0..2 receptive field makes the
    interior outputs bit-identical, and only interiors are stitched back.
    Compute overhead = (1 + t*2*halo/H)^2 - 1 (~7.7% at 640, t=2, halo 12).
    Production win lives INSIDE the b16 chunked-serving subgraphs
    (core/predictor.py _serve_chunk): b16 early stage 7.45 -> 5.57 ms at
    t=2, taking the stacked n/b32 headline 10.40 -> 9.74 ms (/tmp/ab_head
    sweep + headline bench, v5e 2026-08-19). Whole-batch b32/b64 tiling
    measured neutral-to-worse — see tiled_eligible.
    """
    b, h, w, _ = x.shape
    tiles = build_tiles(x, spec, tiles_per_side(b))
    return run_early_from_tiles(params, spec, tiles, b, h, w, upto)


def _chain_ok(params: Params, spec, upto: int, allow_c3k: bool = True) -> bool:
    """Fused float Conv / C3k2 straight chain through layer `upto`."""
    for layer in spec.layers[: upto + 1]:
        if layer.typ == "Conv":
            if "w" not in params[str(layer.idx)]:
                return False  # quantized tree: conv_block owns the int8 path
        elif layer.typ == "C3k2":
            if (layer.kw["c3k"] and not allow_c3k) or "w" not in params[str(layer.idx)]["cv1"]:
                return False
        else:
            return False
        if isinstance(layer.frm, tuple) or (layer.frm != layer.idx - 1 and layer.idx != 0):
            return False  # early stage must be a straight chain
    return True


def eligible(params: Params, spec, upto: int = EARLY_UPTO_DEFAULT) -> bool:
    """The NCHW re-expression handles c3k=False chains only."""
    return _chain_ok(params, spec, upto, allow_c3k=False)


def run_early_nchw(
    params: Params, spec, x: jnp.ndarray, upto: int = EARLY_UPTO_DEFAULT
) -> Tuple[jnp.ndarray, Dict[int, jnp.ndarray]]:
    """Run layers 0..upto in NCHW. `x` is the NHWC (B, H, W, 3) input.

    Returns (NHWC activation after layer `upto`, saved NHWC outputs for any
    early layer the later DAG references).
    """
    from yolo_infer_tpu.models.spec import save_indices

    keep = set(save_indices(spec))
    saved: Dict[int, jnp.ndarray] = {}
    y = jnp.transpose(x, (0, 3, 1, 2))  # bitcast: preprocess already emits W-in-lanes
    for layer in spec.layers[: upto + 1]:
        if layer.typ == "Conv":
            y = _conv(params[str(layer.idx)], y, stride=layer.kw["stride"])
        else:  # C3k2 (eligibility guarantees c3k=False)
            y = _c3k2(params[str(layer.idx)], y, shortcut=layer.kw["shortcut"])
        if layer.idx in keep:
            saved[layer.idx] = jnp.transpose(y, (0, 2, 3, 1))
    return jnp.transpose(y, (0, 2, 3, 1)), saved
