"""Converter parity: torch checkpoint -> native params -> identical outputs.

The torch reference (tests/torch_ref.py) is an independent implementation of
the same spec with ultralytics-style naming; agreement here validates both
the converter's name mapping and the JAX forward's numerics (SURVEY.md §7
hard part 6: weight conversion fidelity).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from yolo_infer_tpu.models import build_spec, forward
from yolo_infer_tpu.models.convert import (
    convert_pt_checkpoint,
    convert_state_dict,
    extract_state_dict,
    infer_model_meta,
    permissive_torch_load,
)

from torch_ref import TorchYOLO11


def _save_ckpt(tmp_path, tmodel, name="m.pt"):
    path = tmp_path / name
    torch.save({"model": tmodel, "epoch": 0}, path)
    return path


@pytest.fixture(scope="module")
def torch_nano():
    torch.manual_seed(0)
    spec = build_spec("detect", "n", nc=80)
    m = TorchYOLO11(spec).eval()
    return m, spec


def test_extract_state_dict_names(torch_nano, tmp_path):
    tmodel, _ = torch_nano
    path = _save_ckpt(tmp_path, tmodel)
    obj = permissive_torch_load(path)
    sd = extract_state_dict(obj["model"])
    assert "model.0.conv.weight" in sd
    assert "model.2.cv1.bn.running_mean" in sd
    assert "model.10.m.0.attn.qkv.conv.weight" in sd
    assert "model.23.cv3.0.0.0.conv.weight" in sd  # DWConv inside cls branch


def test_infer_meta(torch_nano, tmp_path):
    tmodel, _ = torch_nano
    sd = extract_state_dict(tmodel)
    meta = infer_model_meta(sd)
    assert meta["size"] == "n" and meta["task"] == "detect" and meta["nc"] == 80


def test_full_detect_parity(torch_nano, tmp_path):
    tmodel, spec = torch_nano
    path = _save_ckpt(tmp_path, tmodel)
    params, meta = convert_pt_checkpoint(path)
    assert meta["task"] == "detect" and meta["size"] == "n"

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out, _ = forward(params, meta["state"], spec, jnp.asarray(x), compute_dtype=jnp.float32)
    for t_lvl, j_lvl in zip(ref, out["feats"]):
        t_np = t_lvl.numpy().transpose(0, 2, 3, 1)
        j_np = np.asarray(j_lvl)
        np.testing.assert_allclose(t_np, j_np, atol=2e-4, rtol=1e-3)


def test_segment_parity(tmp_path):
    torch.manual_seed(1)
    spec = build_spec("segment", "n", nc=3)
    tmodel = TorchYOLO11(spec).eval()
    path = _save_ckpt(tmp_path, tmodel, "seg.pt")
    params, meta = convert_pt_checkpoint(path)
    assert meta["task"] == "segment" and meta["nc"] == 3

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    feats_t, extras_t = tmodel(xt)
    out, _ = forward(params, meta["state"], spec, jnp.asarray(x), compute_dtype=jnp.float32)
    for t_lvl, j_lvl in zip(feats_t, out["feats"]):
        np.testing.assert_allclose(t_lvl.numpy().transpose(0, 2, 3, 1), np.asarray(j_lvl), atol=2e-4, rtol=1e-3)
    # proto + mask-coef branch parity
    np.testing.assert_allclose(
        extras_t["proto"].numpy().transpose(0, 2, 3, 1), np.asarray(out["proto"]), atol=2e-4, rtol=1e-3
    )
    for t_lvl, j_lvl in zip(extras_t["mc"], out["mc"]):
        np.testing.assert_allclose(t_lvl.numpy().transpose(0, 2, 3, 1), np.asarray(j_lvl), atol=2e-4, rtol=1e-3)


# SURVEY hard-part 6: conversion fidelity across the FULL 5x5 task x size
# matrix (VERDICT r2 next-step 1b: all 25 combos). Each case saves an
# ultralytics-named torch checkpoint, converts it, and asserts forward-parity
# on every head output (feats + task extras). l/x add ~1 min each cold; the
# persistent compile cache makes warm reruns cheap.
_EXTRA_KEYS = {"detect": (), "segment": ("mc",), "pose": ("kpts",), "obb": ("angle",)}


@pytest.mark.parametrize("size", ["n", "s", "m", "l", "x"])
@pytest.mark.parametrize("task", ["detect", "segment", "classify", "pose", "obb"])
def test_task_size_parity(task, size, tmp_path):
    torch.manual_seed(hash((task, size)) % (2**31))
    spec = build_spec(task, size, nc=7)
    tmodel = TorchYOLO11(spec).eval()
    path = _save_ckpt(tmp_path, tmodel, f"{task}_{size}.pt")
    params, meta = convert_pt_checkpoint(path)
    assert meta["task"] == task and meta["size"] == size and meta["nc"] == 7

    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    out, _ = forward(params, meta["state"], spec, jnp.asarray(x), compute_dtype=jnp.float32)

    def close(t, j):
        np.testing.assert_allclose(
            t.detach().numpy().transpose(0, 2, 3, 1) if t.ndim == 4 else t.detach().numpy(),
            np.asarray(j), atol=5e-4, rtol=1e-3,
        )

    if task == "classify":
        close(tmodel(xt), out["logits"])
        return
    ref = tmodel(xt)
    feats_t, extras_t = ref if isinstance(ref, tuple) else (ref, {})
    for t_lvl, j_lvl in zip(feats_t, out["feats"]):
        close(t_lvl, j_lvl)
    for key in _EXTRA_KEYS[task]:
        for t_lvl, j_lvl in zip(extras_t[key], out[key]):
            close(t_lvl, j_lvl)
    if task == "segment":
        close(extras_t["proto"], out["proto"])


def test_model_wrapper_loads_pt(torch_nano, tmp_path):
    from yolo_infer_tpu.core.model import YOLO11Model

    tmodel, _ = torch_nano
    path = _save_ckpt(tmp_path, tmodel, "wrapper.pt")
    m = YOLO11Model(path, compute_dtype=jnp.float32)
    assert m.task == "detect" and m.size == "n"
    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    res = m.predict(img, conf=0.0001, imgsz=64)
    assert len(res) == 1


def test_convert_to_file_roundtrip(torch_nano, tmp_path):
    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.models.convert import convert_to_file

    tmodel, _ = torch_nano
    pt = _save_ckpt(tmp_path, tmodel, "rt.pt")
    native = convert_to_file(pt, tmp_path / "rt.msgpack")
    m1 = YOLO11Model(pt, compute_dtype=jnp.float32)
    m2 = YOLO11Model(native, compute_dtype=jnp.float32)
    img = np.random.default_rng(2).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    a = m1.predict(img, conf=0.0001, imgsz=64)[0]
    b = m2.predict(img, conf=0.0001, imgsz=64)[0]
    assert len(a) == len(b)
    if len(a):
        np.testing.assert_allclose(a.scores, b.scores, atol=1e-4)


@pytest.mark.parametrize("task,size", [("detect", "n"), ("segment", "n"), ("detect", "m")])
def test_export_state_dict_roundtrip(task, size):
    """The probe-based inverse converter reproduces the original torch state
    dict exactly: sd -> convert_state_dict -> export_state_dict == sd.
    (The trained-golden fidelity floor rides this inverse — VERDICT r4 #4.)"""
    from golden_common import golden_state_dict

    from yolo_infer_tpu.models.convert import convert_state_dict, export_state_dict

    spec = build_spec(task, size, nc=4)
    tmodel = TorchYOLO11(spec).eval()
    template = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}
    names, shapes = zip(*[(k, tuple(v.shape)) for k, v in template.items()])
    sd = golden_state_dict(names, shapes)
    params, state = convert_state_dict(sd, spec)
    back = export_state_dict(params, state, spec, template)
    assert set(back) == set(template)
    for k in template:
        if "num_batches_tracked" in k or "dfl" in k:
            np.testing.assert_array_equal(back[k], template[k])  # template fallback
        else:
            np.testing.assert_array_equal(back[k], sd[k], err_msg=k)
