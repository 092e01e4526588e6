"""One-time `.pt` -> native checkpoint converter (offline, torch-cpu only).

The reference consumes ultralytics `.pt` checkpoints directly
(reference core/model.py:100-113); this framework's native format is a
msgpack pytree (SURVEY.md §2b ".pt" row prescribes a converter tool). Two
problems are solved here WITHOUT requiring the ultralytics package:

1. **Unpickling**: `.pt` files pickle ultralytics classes. A permissive
   unpickler substitutes stub types for any class it cannot import, then the
   module tree is walked structurally (`_modules`/`_parameters`/`_buffers`)
   to recover a flat name->tensor state dict.
2. **Name mapping**: dotted torch module names (e.g. `model.2.cv1.conv.weight`)
   are mapped onto this framework's pytree by mirroring the block structure
   (models.blocks init_* functions). Layout conversions: conv OIHW->HWIO,
   linear (out,in)->(in,out), conv-transpose (I,O,kh,kw)->(kh,kw,O,I).

(size, task, nc) are inferred from tensor shapes, so `convert_pt_checkpoint`
needs nothing but the file.
"""

from __future__ import annotations

import logging
import pickle
import types
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

import numpy as np

from yolo_infer_tpu.models.spec import ModelSpec, build_spec

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# permissive torch load
# ---------------------------------------------------------------------------

class _Stub:
    def __init__(self, *a, **k):  # pragma: no cover - pickle plumbing
        pass


# Only these module prefixes may resolve to REAL importable objects during
# unpickling; anything else (os, subprocess, builtins, shutil, ...) becomes an
# inert stub, closing the classic pickle-RCE gadgets. torch/numpy/collections
# are required to rebuild tensors; ultralytics classes are never importable
# here and are stubbed structurally. NOTE: conversion should still only be run
# on checkpoints from trusted sources — torch's own surface is large.
_SAFE_MODULE_PREFIXES = ("torch", "numpy", "collections")


class _PermissiveUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        root = module.split(".", 1)[0]
        if root in _SAFE_MODULE_PREFIXES:
            try:
                return super().find_class(module, name)
            except Exception:  # noqa: BLE001 - missing class becomes a stub
                pass
        return type(name, (_Stub,), {"__module__": module})


def permissive_torch_load(path: Union[str, Path]) -> Any:
    import torch

    shim = types.ModuleType("permissive_pickle")
    shim.Unpickler = _PermissiveUnpickler
    shim.load = lambda f, **k: _PermissiveUnpickler(f).load()
    return torch.load(str(path), pickle_module=shim, weights_only=False, map_location="cpu")


def extract_state_dict(module: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    """Walk a (possibly stubbed) torch module tree -> flat {name: float32 array}."""
    out: Dict[str, np.ndarray] = {}

    def _tensor(v):
        return np.asarray(v.detach().float().numpy()) if hasattr(v, "detach") else np.asarray(v, np.float32)

    d = getattr(module, "__dict__", {})
    for store in ("_parameters", "_buffers"):
        for name, v in (d.get(store) or {}).items():
            if v is not None:
                out[f"{prefix}{name}"] = _tensor(v)
    for name, child in (d.get("_modules") or {}).items():
        if child is not None:
            out.update(extract_state_dict(child, f"{prefix}{name}."))
    return out


# ---------------------------------------------------------------------------
# layout helpers
# ---------------------------------------------------------------------------

def _t(w: np.ndarray) -> np.ndarray:
    """torch conv OIHW -> HWIO."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


class _SD:
    """State-dict view that records missing keys instead of raising late."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = sd
        self.used: set = set()

    def __call__(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(f"missing weight {key!r} — checkpoint layout drift?")
        self.used.add(key)
        return self.sd[key]

    def has(self, key: str) -> bool:
        return key in self.sd


# ---------------------------------------------------------------------------
# per-block converters (mirror models.blocks init_* trees)
# ---------------------------------------------------------------------------

def _conv(sd: _SD, p: str):
    params = {"w": _t(sd(f"{p}.conv.weight")), "gamma": sd(f"{p}.bn.weight"), "beta": sd(f"{p}.bn.bias")}
    state = {"mean": sd(f"{p}.bn.running_mean"), "var": sd(f"{p}.bn.running_var")}
    return params, state


def _conv2d(sd: _SD, p: str):
    return {"w": _t(sd(f"{p}.weight")), "b": sd(f"{p}.bias")}, {}


def _bottleneck(sd: _SD, p: str):
    p1, s1 = _conv(sd, f"{p}.cv1")
    p2, s2 = _conv(sd, f"{p}.cv2")
    return {"cv1": p1, "cv2": p2}, {"cv1": s1, "cv2": s2}


def _seq(items):
    ps = [i[0] for i in items]
    ss = [i[1] for i in items]
    return ps, ss


def _c3k(sd: _SD, p: str):
    out_p, out_s = {}, {}
    for name in ("cv1", "cv2", "cv3"):
        out_p[name], out_s[name] = _conv(sd, f"{p}.{name}")
    ms = []
    j = 0
    while sd.has(f"{p}.m.{j}.cv1.conv.weight"):
        ms.append(_bottleneck(sd, f"{p}.m.{j}"))
        j += 1
    out_p["m"], out_s["m"] = _seq(ms)
    return out_p, out_s


def _c3k2(sd: _SD, p: str):
    out_p, out_s = {}, {}
    out_p["cv1"], out_s["cv1"] = _conv(sd, f"{p}.cv1")
    out_p["cv2"], out_s["cv2"] = _conv(sd, f"{p}.cv2")
    ms = []
    i = 0
    while True:
        if sd.has(f"{p}.m.{i}.cv3.conv.weight"):  # C3k inner block
            ms.append(_c3k(sd, f"{p}.m.{i}"))
        elif sd.has(f"{p}.m.{i}.cv1.conv.weight"):  # plain bottleneck
            ms.append(_bottleneck(sd, f"{p}.m.{i}"))
        else:
            break
        i += 1
    out_p["m"], out_s["m"] = _seq(ms)
    return out_p, out_s, i > 0 and sd.has(f"{p}.m.0.cv3.conv.weight")


def _sppf(sd: _SD, p: str):
    p1, s1 = _conv(sd, f"{p}.cv1")
    p2, s2 = _conv(sd, f"{p}.cv2")
    return {"cv1": p1, "cv2": p2}, {"cv1": s1, "cv2": s2}


def _attention(sd: _SD, p: str):
    out_p, out_s = {}, {}
    for name in ("qkv", "proj", "pe"):
        out_p[name], out_s[name] = _conv(sd, f"{p}.{name}")
    return out_p, out_s


def _psablock(sd: _SD, p: str):
    ap, as_ = _attention(sd, f"{p}.attn")
    f1p, f1s = _conv(sd, f"{p}.ffn.0")
    f2p, f2s = _conv(sd, f"{p}.ffn.1")
    return {"attn": ap, "ffn1": f1p, "ffn2": f2p}, {"attn": as_, "ffn1": f1s, "ffn2": f2s}


def _c2psa(sd: _SD, p: str):
    out_p, out_s = {}, {}
    out_p["cv1"], out_s["cv1"] = _conv(sd, f"{p}.cv1")
    out_p["cv2"], out_s["cv2"] = _conv(sd, f"{p}.cv2")
    ms = []
    i = 0
    while sd.has(f"{p}.m.{i}.attn.qkv.conv.weight"):
        ms.append(_psablock(sd, f"{p}.m.{i}"))
        i += 1
    out_p["m"], out_s["m"] = _seq(ms)
    return out_p, out_s


def _branch3(sd: _SD, p: str):
    """cv2-style branch: Conv, Conv, Conv2d."""
    items = [_conv(sd, f"{p}.0"), _conv(sd, f"{p}.1"), _conv2d(sd, f"{p}.2")]
    return _seq(items)


def _cls_branch(sd: _SD, p: str):
    """cv3-style branch: Seq(DWConv, Conv), Seq(DWConv, Conv), Conv2d -> our flat 5."""
    items = [
        _conv(sd, f"{p}.0.0"),
        _conv(sd, f"{p}.0.1"),
        _conv(sd, f"{p}.1.0"),
        _conv(sd, f"{p}.1.1"),
        _conv2d(sd, f"{p}.2"),
    ]
    return _seq(items)


def _detect(sd: _SD, p: str, nl: int = 3):
    cv2_p, cv2_s, cv3_p, cv3_s = [], [], [], []
    for i in range(nl):
        bp, bs = _branch3(sd, f"{p}.cv2.{i}")
        cp, cs = _cls_branch(sd, f"{p}.cv3.{i}")
        cv2_p.append(bp)
        cv2_s.append(bs)
        cv3_p.append(cp)
        cv3_s.append(cs)
    return {"cv2": cv2_p, "cv3": cv3_p}, {"cv2": cv2_s, "cv3": cv3_s}


def _extra_branch(sd: _SD, p: str, nl: int = 3):
    items = [_branch3(sd, f"{p}.{i}") for i in range(nl)]
    return _seq(items)


def _proto(sd: _SD, p: str):
    out_p, out_s = {}, {}
    out_p["cv1"], out_s["cv1"] = _conv(sd, f"{p}.cv1")
    out_p["up"] = {
        "wt": np.ascontiguousarray(sd(f"{p}.upsample.weight").transpose(2, 3, 1, 0)),  # (I,O,kh,kw)->(kh,kw,O,I)
        "b": sd(f"{p}.upsample.bias"),
    }
    out_p["cv2"], out_s["cv2"] = _conv(sd, f"{p}.cv2")
    out_p["cv3"], out_s["cv3"] = _conv(sd, f"{p}.cv3")
    return out_p, out_s


def _classify(sd: _SD, p: str):
    cp, cs = _conv(sd, f"{p}.conv")
    lin = {"w": np.ascontiguousarray(sd(f"{p}.linear.weight").T), "b": sd(f"{p}.linear.bias")}
    return {"conv": cp, "linear": lin}, {"conv": cs}


# ---------------------------------------------------------------------------
# model-level conversion
# ---------------------------------------------------------------------------

_C0_TO_SIZE = {16: "n", 32: "s", 96: "x"}  # 64 is m or l (disambiguated by depth)


def infer_model_meta(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Infer (size, task, nc, ...) from tensor shapes alone."""
    c0 = sd["model.0.conv.weight"].shape[0]
    if c0 == 64:
        size = "l" if "model.2.m.1.cv1.conv.weight" in sd else "m"
    else:
        size = _C0_TO_SIZE.get(c0)
    if size is None:
        raise ValueError(f"cannot infer model size from stem width {c0}")

    head_idx = max(int(k.split(".")[1]) for k in sd if k.startswith("model."))
    h = f"model.{head_idx}"
    meta: Dict[str, Any] = {"size": size, "head_idx": head_idx}
    if f"{h}.linear.weight" in sd:
        meta["task"] = "classify"
        meta["nc"] = sd[f"{h}.linear.weight"].shape[0]
        return meta
    meta["nc"] = sd[f"{h}.cv3.0.2.weight"].shape[0]
    if f"{h}.proto.cv1.conv.weight" in sd:
        meta["task"] = "segment"
        meta["nm"] = sd[f"{h}.cv4.0.2.weight"].shape[0]
    elif f"{h}.cv4.0.2.weight" in sd:
        c4_out = sd[f"{h}.cv4.0.2.weight"].shape[0]
        if c4_out == 1:
            meta["task"] = "obb"
            meta["ne"] = 1
        else:
            meta["task"] = "pose"
            meta["kpt_shape"] = (c4_out // 3, 3) if c4_out % 3 == 0 else (c4_out, 1)
    else:
        meta["task"] = "detect"
    return meta


def convert_state_dict(sd_raw: Dict[str, np.ndarray], spec: ModelSpec) -> Tuple[Dict, Dict]:
    """Flat torch state dict -> (params, state) trees matching build_model."""
    sd = _SD(sd_raw)
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}
    for layer in spec.layers:
        p = f"model.{layer.idx}"
        key = str(layer.idx)
        t = layer.typ
        if t == "Conv":
            params[key], state[key] = _conv(sd, p)
        elif t == "C3k2":
            params[key], state[key], found_c3k = _c3k2(sd, p)
            if found_c3k != layer.kw["c3k"]:
                raise ValueError(f"layer {layer.idx}: c3k mismatch (ckpt {found_c3k} vs spec {layer.kw['c3k']})")
        elif t == "SPPF":
            params[key], state[key] = _sppf(sd, p)
        elif t == "C2PSA":
            params[key], state[key] = _c2psa(sd, p)
        elif t in ("Upsample", "Concat"):
            continue
        elif t in ("Detect", "Segment", "Pose", "OBB"):
            params[key], state[key] = _detect(sd, p, nl=len(layer.frm))
            if t == "Segment":
                params[key]["cv4"], state[key]["cv4"] = _extra_branch(sd, f"{p}.cv4", nl=len(layer.frm))
                params[key]["proto"], state[key]["proto"] = _proto(sd, f"{p}.proto")
            elif t in ("Pose", "OBB"):
                params[key]["cv4"], state[key]["cv4"] = _extra_branch(sd, f"{p}.cv4", nl=len(layer.frm))
        elif t == "Classify":
            params[key], state[key] = _classify(sd, p)
        else:
            raise ValueError(t)
    unused = {k for k in sd.sd if not k.endswith("num_batches_tracked") and "dfl" not in k} - sd.used
    if unused:
        logger.warning("converter: %d unused checkpoint tensors (e.g. %s)", len(unused), sorted(unused)[:5])
    return params, state


def convert_pt_checkpoint(path: Union[str, Path]) -> Tuple[Dict, Dict[str, Any]]:
    """Load a `.pt` checkpoint -> (deploy-or-train params, meta dict).

    Returns unfused (BN-separate) params + state packed into meta["state"];
    callers fold for deployment.
    """
    import jax.numpy as jnp

    obj = permissive_torch_load(path)
    model_obj = None
    if isinstance(obj, dict):
        model_obj = obj.get("ema") or obj.get("model")
    if model_obj is None:
        model_obj = obj
    sd = extract_state_dict(model_obj)
    # ultralytics wraps the layer list in an inner `.model` attribute
    if not any(k.startswith("model.") for k in sd):
        sd = {f"model.{k}" if not k.startswith("model.") else k: v for k, v in sd.items()}
    meta = infer_model_meta(sd)
    spec_kw = {k: meta[k] for k in ("nm", "kpt_shape", "ne") if k in meta}
    spec = build_spec(meta["task"], meta["size"], meta["nc"], **spec_kw)
    params, state = convert_state_dict(sd, spec)
    names = None
    raw_names = getattr(model_obj, "__dict__", {}).get("names")
    if isinstance(raw_names, dict):
        names = {int(k): str(v) for k, v in raw_names.items()}
    out_meta = {
        "task": meta["task"],
        "size": meta["size"],
        "nc": meta["nc"],
        "names": names,
        "state": state,
        "fused": False,
    }
    logger.info("converted %s: %s/%s nc=%d", path, meta["task"], meta["size"], meta["nc"])
    return params, out_meta


def convert_to_file(pt_path: Union[str, Path], out_path: Optional[Union[str, Path]] = None) -> Path:
    """CLI-facing: .pt -> .msgpack native checkpoint."""
    from yolo_infer_tpu.core.model import YOLO11Model

    params, meta = convert_pt_checkpoint(pt_path)
    model = YOLO11Model.from_params(
        params,
        task=meta["task"],
        size=meta["size"],
        nc=meta["nc"],
        names=meta["names"],
        fused=False,
        state=meta["state"],
    )
    out = Path(out_path or Path(pt_path).with_suffix(".msgpack"))
    return model.save(out)


def export_state_dict(
    params: Dict,
    state: Dict,
    spec: ModelSpec,
    template: Dict[str, np.ndarray],
) -> Dict[str, np.ndarray]:
    """Inverse of convert_state_dict: (params, state) trees -> torch-layout
    flat state dict.

    Probe-based exact inversion, so it can never drift from the forward
    converter: convert_state_dict runs once on an index-valued float64 state
    dict (value = global flat position), which yields, for every jax-tree
    element, the torch flat position it came from; the trained values are
    then scattered back through that map. Keys the converter never consumes
    (num_batches_tracked, the fixed DFL expectation conv) keep the
    `template` values (pass `TorchYOLO11(spec).state_dict()` — its own init
    is already correct for those).

    Used to run the torch reference pipeline of the two-pipeline fidelity
    protocol on TRAINED jax weights (VERDICT r4 item 4: the m-scale floor
    needs trained-like golden weights, random golden puts m scores in a
    ranking-chatter regime).
    """
    import jax

    names = list(template.keys())
    shapes = [tuple(np.asarray(template[n]).shape) for n in names]
    probe: Dict[str, np.ndarray] = {}
    base = 0
    for n, s in zip(names, shapes):
        size = int(np.prod(s)) if s else 1
        probe[n] = np.arange(base, base + size, dtype=np.float64).reshape(s)
        base += size
    p_probe, s_probe = convert_state_dict(probe, spec)

    tp, tdef_p = jax.tree_util.tree_flatten(params)
    pp, pdef_p = jax.tree_util.tree_flatten(p_probe)
    ts, tdef_s = jax.tree_util.tree_flatten(state)
    ps, pdef_s = jax.tree_util.tree_flatten(s_probe)
    if tdef_p != pdef_p or tdef_s != pdef_s:
        raise ValueError("trained tree structure does not match convert_state_dict(spec) output")

    flat = np.full((base,), np.nan, dtype=np.float64)
    for trained, idx in zip(tp + ts, pp + ps):
        flat[np.asarray(idx).ravel().astype(np.int64)] = np.asarray(trained, dtype=np.float64).ravel()

    out: Dict[str, np.ndarray] = {}
    base = 0
    for n, s in zip(names, shapes):
        size = int(np.prod(s)) if s else 1
        vals = flat[base : base + size]
        if np.isnan(vals).all():  # converter never consumed this tensor
            out[n] = np.asarray(template[n])
        else:
            out[n] = vals.reshape(s).astype(np.asarray(template[n]).dtype)
        base += size
    return out
