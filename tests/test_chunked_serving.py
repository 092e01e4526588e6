"""Batch-chunked serving: chunked programs must equal the whole-batch program.

The serving pipeline optionally runs a batch as B/chunk sub-batches inside
one jitted program (core/predictor.py _serve_chunk): at lane-starved batches
XLA's early-conv layout choice wastes 4x lane reads, and chunk-16 subgraphs
inherit the measured-fast b16 layouts (n/b32 e2e 14.1 -> 10.4 ms on v5e).
Every per-image output is fixed-shape, so chunking must be EXACTLY
output-equivalent — these tests gate that for both chunk modes and for every
task head. Reference semantic: one predict call per batch
(reference core/model.py:118-133); chunking is an internal layout tactic.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _dets(predictor, imgs, conf=1e-6):
    out = predictor.predict_raw(jnp.asarray(imgs), conf, 0.45, imgs.shape[1])
    return jax.tree_util.tree_map(np.asarray, out)


@pytest.mark.parametrize("mode", ["scan", "unroll"])
def test_chunked_equals_whole_detect(tiny_deploy, monkeypatch, mode):
    from yolo_infer_tpu.core.predictor import Predictor

    params, spec = tiny_deploy
    imgs = np.random.default_rng(0).integers(0, 255, (4, 64, 64, 3), dtype=np.uint8)

    monkeypatch.setenv("YOLO_TPU_SERVE_CHUNK", "0")
    base = _dets(Predictor(params, spec, compute_dtype=jnp.float32), imgs)

    monkeypatch.setenv("YOLO_TPU_SERVE_CHUNK", "2")
    monkeypatch.setenv("YOLO_TPU_CHUNK_MODE", mode)
    out = _dets(Predictor(params, spec, compute_dtype=jnp.float32), imgs)

    assert set(base) == set(out)
    for k in base:
        np.testing.assert_array_equal(base[k], out[k], err_msg=k)


@pytest.fixture(scope="module")
def tiny_seg_deploy():
    from yolo_infer_tpu.models import build_model, fold_model

    params, state, spec = build_model(jax.random.PRNGKey(0), "segment", "n", nc=3)
    return fold_model(params, state), spec


def test_chunked_equals_whole_segment(tiny_seg_deploy, monkeypatch):
    from yolo_infer_tpu.core.predictor import Predictor

    params, spec = tiny_seg_deploy
    imgs = np.random.default_rng(1).integers(0, 255, (4, 64, 64, 3), dtype=np.uint8)

    monkeypatch.setenv("YOLO_TPU_SERVE_CHUNK", "0")
    base = _dets(Predictor(params, spec, compute_dtype=jnp.float32), imgs)
    monkeypatch.setenv("YOLO_TPU_SERVE_CHUNK", "2")
    monkeypatch.setenv("YOLO_TPU_CHUNK_MODE", "scan")
    out = _dets(Predictor(params, spec, compute_dtype=jnp.float32), imgs)
    for k in base:
        np.testing.assert_array_equal(base[k], out[k], err_msg=k)


@pytest.mark.parametrize("task", ["obb", "classify"])
def test_chunked_equals_whole_obb_classify(task, monkeypatch):
    """obb/classify joined the default chunk policy (unroll) — gate exact
    output equivalence for both, like detect/segment above."""
    from yolo_infer_tpu.core.predictor import Predictor
    from yolo_infer_tpu.models import build_model, fold_model

    params, state, spec = build_model(jax.random.PRNGKey(2), task, "n", nc=3)
    deploy = fold_model(params, state)
    imgs = np.random.default_rng(2).integers(0, 255, (4, 64, 64, 3), dtype=np.uint8)

    monkeypatch.setenv("YOLO_TPU_SERVE_CHUNK", "0")
    base = _dets(Predictor(deploy, spec, compute_dtype=jnp.float32), imgs)
    monkeypatch.setenv("YOLO_TPU_SERVE_CHUNK", "2")
    monkeypatch.setenv("YOLO_TPU_CHUNK_MODE", "unroll")
    out = _dets(Predictor(deploy, spec, compute_dtype=jnp.float32), imgs)
    assert set(base) == set(out)
    for k in base:
        np.testing.assert_array_equal(base[k], out[k], err_msg=k)


def test_chunk_policy_guards():
    """Chunking never engages for meshed/quantized predictors or non-divisible
    batches (the jit body falls through to the whole-batch program)."""
    from yolo_infer_tpu.core.predictor import _serve_chunk

    assert _serve_chunk(32, "n", "detect", True, False)[0] == 0  # meshed
    assert _serve_chunk(32, "n", "detect", False, True)[0] == 0  # quantized
    # obb/cls join with unroll (ab_chunk3 A/B: +3.7% / +4.4% at n/b32);
    # pose and seg joined after the select-then-decode tail rewrite
    # unblocked them (bench_rowsel: pose 17.15 -> 11.85 scan; seg's old
    # -6% flipped to +4.8% unroll)
    for task in ("obb", "classify", "segment"):
        assert _serve_chunk(32, "n", task, False, False) == (16, "unroll")
    assert _serve_chunk(32, "n", "pose", False, False) == (16, "scan")
    # n/b64: detect/pose/obb chunk (r5 matrix: +6.6% / +2.7% / +15%);
    # segment/classify measured whole-faster and stay whole
    assert _serve_chunk(64, "n", "pose", False, False) == (16, "unroll")
    assert _serve_chunk(64, "n", "obb", False, False) == (16, "unroll")
    assert _serve_chunk(64, "n", "segment", False, False)[0] == 0
    assert _serve_chunk(64, "n", "classify", False, False)[0] == 0
    # round-4 b64/b96 matrix (2026-08-20): chunking loses at m/l/x b64
    # (-9.6/-21/-8%) and n/b96 (-54%) — only B == 32 chunks by default
    for b, want_chunk in ((8, False), (16, False), (32, True), (48, False), (64, False), (96, False), (128, False)):
        c, mode = _serve_chunk(b, "m", "detect", False, False)
        engaged = bool(c) and b > c and b % c == 0
        assert engaged == want_chunk, (b, c)
        assert mode == "unroll"  # scan is the measured n-at-2-chunks exception
    assert _serve_chunk(32, "n", "detect", False, False) == (16, "scan")
    assert _serve_chunk(64, "n", "detect", False, False) == (16, "unroll")
    # r5 completion matrix: the 3-chunk n/b48 cells WIN for EVERY task with
    # scan (detect +7.9%, pose +12.7%, obb +20.9%, classify +7.5%, segment
    # +1.6% — all measured); b80/b96/b112 lose (5+ chunks)
    for task in ("detect", "pose", "obb", "segment", "classify"):
        assert _serve_chunk(48, "n", task, False, False) == (16, "scan")
    for b in (80, 96, 112):
        assert _serve_chunk(b, "n", "detect", False, False)[0] == 0
    # s stays whole at every batch (chunk/tile matrix: chunking costs s 32%
    # at b32); the other sizes keep the chunk policy
    for b in (32, 48, 64, 96):
        assert _serve_chunk(b, "s", "detect", False, False)[0] == 0
    for size in ("m", "l", "x"):
        assert _serve_chunk(32, size, "detect", False, False)[0] == 16
    # segment chunks at n ONLY (m/b32 task matrix: 55.38 chunked vs 54.99
    # whole = -0.7%, and the chunked program costs a 561 s compile vs 17 s);
    # obb/classify keep the chunk at m (+7.4% / +4.6%)
    for size in ("m", "l", "x"):
        assert _serve_chunk(32, size, "segment", False, False)[0] == 0
    assert _serve_chunk(32, "m", "obb", False, False) == (16, "unroll")
    assert _serve_chunk(32, "m", "classify", False, False) == (16, "unroll")
    # imgsz gate (imgsz matrix 2026-08-19): below 640 batches stay whole
    # (n/b32@320 measured 3.97 ms whole vs 5.12 chunked); 640/1280 chunk
    # (1280: 45.24 chunked vs 62.43 whole)
    assert _serve_chunk(32, "n", "detect", False, False, imgsz=320)[0] == 0
    assert _serve_chunk(32, "m", "detect", False, False, imgsz=480)[0] == 0
    assert _serve_chunk(32, "n", "detect", False, False, imgsz=1280) == (16, "scan")


def test_chunked_equals_whole_val_program(tiny_deploy, monkeypatch):
    """The VALIDATOR's device program (conf=0.001, multi_label, raised
    pre_topk — reference validator protocol, ref core/validator.py:86-136)
    must also be chunk-invariant: the r5 hardware A/B made chunking the val
    default win at b32/b64 (29.5 vs 34.8 ms, 57.3 vs 62.1 — bench_val_loop
    2026-08-20), so its equivalence is gated here like the serving paths."""
    from yolo_infer_tpu.core.predictor import Predictor

    params, spec = tiny_deploy
    imgs = np.random.default_rng(3).integers(0, 255, (4, 64, 64, 3), dtype=np.uint8)

    def val_dets(predictor):
        out = predictor.predict_raw(jnp.asarray(imgs), 0.001, 0.6, imgs.shape[1],
                                    multi_label=True, pre_topk=512)
        return jax.tree_util.tree_map(np.asarray, out)

    monkeypatch.setenv("YOLO_TPU_SERVE_CHUNK", "0")
    base = val_dets(Predictor(params, spec, compute_dtype=jnp.float32))
    monkeypatch.setenv("YOLO_TPU_SERVE_CHUNK", "2")
    monkeypatch.setenv("YOLO_TPU_CHUNK_MODE", "unroll")
    out = val_dets(Predictor(params, spec, compute_dtype=jnp.float32))
    assert set(base) == set(out)
    for k in base:
        np.testing.assert_array_equal(base[k], out[k], err_msg=k)
