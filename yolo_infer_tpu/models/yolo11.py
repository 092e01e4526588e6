"""YOLO11 model builder + functional forward (the DAG executor).

The whole network executes as one traced XLA graph: the Python loop over
layers below unrolls at trace time (static topology, static shapes), which is
exactly what XLA wants — no dynamic control flow, every conv lands on the MXU.

Replaces the external `ultralytics.YOLO` graph the reference depends on
(reference core/model.py:100-133).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from yolo_infer_tpu.models import blocks as B
from yolo_infer_tpu.models.spec import ModelSpec, build_spec, save_indices
from yolo_infer_tpu.nn.layers import fold_batchnorm, upsample2x

Params = Dict[str, Any]
State = Dict[str, Any]


def build_model(
    rng: jax.Array,
    task: str = "detect",
    size: str = "n",
    nc: int = 80,
    dtype=jnp.float32,
    **extras,
) -> Tuple[Params, State, ModelSpec]:
    """Initialize parameters/state for a YOLO11 model."""
    spec = build_spec(task=task, size=size, nc=nc, **extras)
    rngs = jax.random.split(rng, len(spec.layers))
    params: Params = {}
    state: State = {}
    for layer, r in zip(spec.layers, rngs):
        t = layer.typ
        key = str(layer.idx)
        if t == "Conv":
            p, s = B.init_conv(r, layer.c_in, layer.c_out, layer.kw["k"], dtype=dtype)
        elif t == "C3k2":
            p, s = B.init_c3k2(r, layer.c_in, layer.c_out, layer.kw["n"], c3k=layer.kw["c3k"], e=layer.kw["e"], dtype=dtype)
        elif t == "SPPF":
            p, s = B.init_sppf(r, layer.c_in, layer.c_out, dtype=dtype)
        elif t == "C2PSA":
            p, s = B.init_c2psa(r, layer.c_in, layer.kw["n"], e=0.5, dtype=dtype)
        elif t in ("Upsample", "Concat"):
            continue
        elif t == "Detect":
            p, s = B.init_detect(r, layer.c_in, nc, spec.reg_max, strides=spec.strides, dtype=dtype)
        elif t == "Segment":
            r1, r2, r3 = jax.random.split(r, 3)
            p, s = B.init_detect(r1, layer.c_in, nc, spec.reg_max, strides=spec.strides, dtype=dtype)
            c4 = max(layer.c_in[0] // 4, spec.nm)
            p["cv4"], s["cv4"] = B.init_extra_branch(r2, layer.c_in, c4, spec.nm, dtype=dtype)
            c_proto = max(layer.c_in[0] // 4, spec.nm * 2)  # width-scaled proto channels
            p["proto"], s["proto"] = B.init_proto(r3, layer.c_in[0], c_proto, spec.nm, dtype=dtype)
        elif t == "Pose":
            r1, r2 = jax.random.split(r)
            p, s = B.init_detect(r1, layer.c_in, nc, spec.reg_max, strides=spec.strides, dtype=dtype)
            nk = spec.kpt_shape[0] * spec.kpt_shape[1]
            c4 = max(layer.c_in[0] // 4, nk)
            p["cv4"], s["cv4"] = B.init_extra_branch(r2, layer.c_in, c4, nk, dtype=dtype)
        elif t == "OBB":
            r1, r2 = jax.random.split(r)
            p, s = B.init_detect(r1, layer.c_in, nc, spec.reg_max, strides=spec.strides, dtype=dtype)
            c4 = max(layer.c_in[0] // 4, spec.ne)
            p["cv4"], s["cv4"] = B.init_extra_branch(r2, layer.c_in, c4, spec.ne, dtype=dtype)
        elif t == "Classify":
            p, s = B.init_classify(r, layer.c_in, nc, layer.kw["c_hidden"], dtype=dtype)
        else:
            raise ValueError(f"unknown layer type {t}")
        params[key] = p
        state[key] = s
    return params, state, spec


def forward(
    params: Params,
    state: Optional[State],
    spec: ModelSpec,
    x: jnp.ndarray,
    *,
    training: bool = False,
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "auto",  # "xla" forces einsum attention (meshed serving)
    early_tiles: Optional[Tuple[int, int, int]] = None,  # (B, H, W): `x` is a
    # prebuilt (t*t*B, hs, ws, 3) tile stack from models.early.build_tiles —
    # the serving path tiles the RAW u8 frames so the /255 convert fuses
    # per-tile (core/predictor.py) instead of materializing full-res bf16
) -> Tuple[Any, Optional[State]]:
    """Run the model DAG. `x` is (B, H, W, 3) float in [0, 1].

    Returns (head_output, new_state). head_output is a dict:
      detect : {"feats": [(B,Hi,Wi,4*reg_max+nc)] * 3}
      segment: + {"mc": [...nm maps], "proto": (B,H/4,W/4,nm)}
      pose   : + {"kpts": [...nk maps]}
      obb    : + {"angle": [...ne maps]}
      classify: {"logits": (B, nc)}
    """
    x = x.astype(compute_dtype)
    keep = set(save_indices(spec))
    ys: Dict[int, jnp.ndarray] = {}
    new_state: State = {}
    prev = x
    out: Any = None
    start_idx = 0
    if early_tiles is not None:
        from yolo_infer_tpu.models import early as E

        b0, h0, w0 = early_tiles
        prev, saved_early = E.run_early_from_tiles(params, spec, x, b0, h0, w0)
        ys.update(saved_early)
        start_idx = E.EARLY_UPTO_DEFAULT + 1
    elif not training and state is None:
        # small-batch lane fix: at 8 <= B < 128 the XLA conv emitter for the
        # tiny-channel early stage (layers 0-2) pads batch -> 128 lanes, so
        # b32 pays nearly the b128 cost (~8.9 of 12.9 ms at n/b32 on v5e).
        # Run those layers on 2x2 halo-padded quadrants instead: 4B tiles
        # fill the lanes, the halo >= receptive field makes interiors exact,
        # and only interiors are stitched back (models/early.py;
        # measured A/B in tools/bench_early_layouts.py).
        import os as _os

        from yolo_infer_tpu.models import early as E
        from yolo_infer_tpu.nn import quantize as Q

        clean = (
            attn_impl != "xla"  # meshed serving: keep the batch axis GSPMD-clean
            and Q.current_context() is None
            and not isinstance(x, Q.QAct)
        )
        if (
            _os.environ.get("YOLO_TPU_EARLY_TILED", "1") == "1"
            and clean
            and E.tiled_eligible(params, spec, x.shape[0], x.shape[1], x.shape[2])
        ):
            prev, saved_early = E.run_early_tiled(params, spec, x)
            ys.update(saved_early)
            start_idx = E.EARLY_UPTO_DEFAULT + 1
        elif (
            _os.environ.get("YOLO_TPU_EARLY_NCHW", "") == "1"
            and clean
            and E.eligible(params, spec)
        ):
            # NCHW re-expression of the early chain (models/early.py): one
            # W-in-lanes layout end-to-end, no relayout copies. Env-gated
            # A/B hook for the whole-batch regimes the tile path excludes
            # (s at any batch; every size at B > 16 outside the chunk
            # policy) — the r5 s/b32 trace shows two ~1.6-2.0 ms early
            # fusions + a 0.58 ms copy that this layout targets.
            prev, saved_early = E.run_early_nchw(params, spec, x)
            ys.update(saved_early)
            start_idx = E.EARLY_UPTO_DEFAULT + 1
    for layer in spec.layers:
        if layer.idx < start_idx:
            continue
        t = layer.typ
        key = str(layer.idx)
        s = state.get(key) if state is not None else None
        if isinstance(layer.frm, tuple):
            inp = [prev if f == layer.idx - 1 else ys[f] for f in layer.frm]
        else:
            inp = prev if layer.frm == layer.idx - 1 or layer.idx == 0 else ys[layer.frm]

        if t == "Conv":
            import os as _os

            if (
                layer.idx == 0
                and layer.kw["k"] == 3
                and layer.kw["stride"] == 2
                and "w_q" not in params[key]
                and inp.shape[1] % 2 == 0
                and inp.shape[2] % 2 == 0
                and _os.environ.get("YOLO_TPU_S2D", "0") == "1"  # opt-in: A/B showed XLA already handles the stem
            ):
                # stem: exact space-to-depth rewrite (MXU-utilization win)
                from yolo_infer_tpu.nn.layers import stem_conv_s2d

                y, ns = stem_conv_s2d(params[key], s, inp, training=training)
            else:
                y, ns = B.apply_conv(params[key], s, inp, stride=layer.kw["stride"], training=training)
        elif t == "C3k2":
            y, ns = B.apply_c3k2(params[key], s, inp, c3k=layer.kw["c3k"], shortcut=layer.kw["shortcut"], training=training)
        elif t == "SPPF":
            y, ns = B.apply_sppf(params[key], s, inp, k=layer.kw["k"], training=training)
        elif t == "C2PSA":
            y, ns = B.apply_c2psa(params[key], s, inp, training=training, attn_impl=attn_impl)
        elif t == "Upsample":
            from yolo_infer_tpu.nn.quantize import QAct

            if isinstance(inp, QAct):  # nearest-neighbour repeat is exact on int8
                y, ns = QAct(upsample2x(inp.q), inp.s), None
            else:
                y, ns = upsample2x(inp), None
        elif t == "Concat":
            from yolo_infer_tpu.nn.quantize import q_concat

            y, ns = q_concat(inp, axis=-1), None
        elif t in ("Detect", "Segment", "Pose", "OBB"):
            feats, ns = B.apply_detect(params[key], s, inp, training=training)
            out = {"feats": feats}
            if t == "Segment":
                mc, s4 = B.apply_extra_branch(params[key]["cv4"], s["cv4"] if s else None, inp, training)
                proto, sp = B.apply_proto(params[key]["proto"], s["proto"] if s else None, inp[0], training)
                out["mc"], out["proto"] = mc, proto
                if ns is not None:
                    ns["cv4"], ns["proto"] = s4, sp
            elif t == "Pose":
                kpts, s4 = B.apply_extra_branch(params[key]["cv4"], s["cv4"] if s else None, inp, training)
                out["kpts"] = kpts
                if ns is not None:
                    ns["cv4"] = s4
            elif t == "OBB":
                angle, s4 = B.apply_extra_branch(params[key]["cv4"], s["cv4"] if s else None, inp, training)
                out["angle"] = angle
                if ns is not None:
                    ns["cv4"] = s4
            y = None
        elif t == "Classify":
            logits, ns = B.apply_classify(params[key], s, inp, training=training)
            out = {"logits": logits.astype(jnp.float32)}
            y = None
        else:
            raise ValueError(t)

        if ns is not None:
            new_state[key] = ns
        if y is not None:
            prev = y
            if layer.idx in keep:
                ys[layer.idx] = y
    return out, (new_state if state is not None else None)


def fold_model(params: Params, state: State) -> Params:
    """Fold all batch-norms into conv weights for deployment (stateless model)."""

    def _fold(p, s):
        if isinstance(p, dict):
            if "w" in p and "gamma" in p:
                return fold_batchnorm(p, s)
            return {k: _fold(v, s.get(k) if isinstance(s, dict) else None) for k, v in p.items()}
        if isinstance(p, list):
            return [_fold(pi, s[i] if isinstance(s, list) else None) for i, pi in enumerate(p)]
        return p

    return _fold(params, state)


def param_count(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def cast_params(params: Params, dtype) -> Params:
    return jax.tree_util.tree_map(lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
