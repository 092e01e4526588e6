"""Pallas kernels vs jnp references (interpret mode on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from yolo_infer_tpu.ops.decode import dfl_expectation
from yolo_infer_tpu.ops.nms import nms_numpy_reference
from yolo_infer_tpu.ops.iou import box_iou_matrix
from yolo_infer_tpu.ops.pallas.dfl_kernel import dfl_decode_pallas
from yolo_infer_tpu.ops.pallas.nms_kernel import greedy_nms_pallas


def test_dfl_kernel_matches_reference():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 2, (2, 700, 64)).astype(np.float32)  # A=700 exercises padding
    ref = np.asarray(dfl_expectation(jnp.asarray(x)))
    got = np.asarray(dfl_decode_pallas(jnp.asarray(x), tile=512, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1])
def test_greedy_nms_kernel_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    k = 128
    cxy = rng.uniform(50, 590, (k, 2))
    wh = rng.uniform(10, 120, (k, 2))
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)
    scores = np.sort(rng.uniform(0, 1, k).astype(np.float32))[::-1].copy()  # sorted desc
    iou = np.asarray(box_iou_matrix(jnp.asarray(boxes), jnp.asarray(boxes)))
    valid = np.ones(k, bool)

    kept = np.asarray(greedy_nms_pallas(jnp.asarray(iou[None]), jnp.asarray(valid[None]), 0.5, interpret=True))[0]
    want = np.zeros(k, bool)
    want[nms_numpy_reference(boxes, scores, 0.5)] = True
    np.testing.assert_array_equal(kept, want)


def test_greedy_nms_kernel_respects_valid_mask():
    k = 128
    iou = np.eye(k, dtype=np.float32)[None]
    valid = np.zeros(k, bool)
    valid[:5] = True
    kept = np.asarray(greedy_nms_pallas(jnp.asarray(iou), jnp.asarray(valid[None]), 0.5, interpret=True))[0]
    assert kept[:5].all() and not kept[5:].any()


def _random_sorted_candidates(rng, b, k):
    cxy = rng.uniform(50, 590, (b, k, 2))
    wh = rng.uniform(10, 120, (b, k, 2))
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)
    scores = -np.sort(-rng.uniform(0, 1, (b, k)).astype(np.float32), axis=1)
    return boxes, scores


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fused_nms_kernel_matches_fixpoint_and_oracle(seed):
    """nms_fused (the TPU production keep kernel) == XLA fixpoint == oracle."""
    import jax

    from yolo_infer_tpu.ops.nms import _nms_fixpoint
    from yolo_infer_tpu.ops.pallas.nms_fused import nms_keep_pallas

    rng = np.random.default_rng(seed)
    b, k = 3, 160  # non-multiple-of-128 K exercises lane padding
    boxes, scores = _random_sorted_candidates(rng, b, k)
    valid = scores > 0.15

    kept_pl = np.asarray(nms_keep_pallas(jnp.asarray(boxes), jnp.asarray(valid), 0.5, interpret=True))
    kept_fx = np.asarray(
        jax.vmap(
            lambda bx, va: _nms_fixpoint(box_iou_matrix(bx, bx), va, jnp.float32(0.5), max_sweeps=k)
        )(jnp.asarray(boxes), jnp.asarray(valid))
    )
    np.testing.assert_array_equal(kept_pl, kept_fx)

    for i in range(b):
        want = np.zeros(k, bool)
        order_keep = nms_numpy_reference(boxes[i], scores[i], 0.5)
        want[[j for j in order_keep if valid[i, j]]] = True
        # oracle has no validity mask: restrict to valid rows, then the greedy
        # scan over only-valid candidates must agree
        vb = boxes[i][valid[i]]
        vs = scores[i][valid[i]]
        want_v = np.zeros(valid[i].sum(), bool)
        want_v[nms_numpy_reference(vb, vs, 0.5)] = True
        np.testing.assert_array_equal(kept_pl[i][valid[i]], want_v)
        assert not kept_pl[i][~valid[i]].any()


def test_fused_nms_kernel_suppression_chain():
    """A suppresses B, so C (overlapped only by B) must survive."""
    from yolo_infer_tpu.ops.pallas.nms_fused import nms_keep_pallas

    boxes = np.array(
        [[[0, 0, 100, 100], [40, 0, 140, 100], [80, 0, 180, 100], [500, 500, 510, 510]]],
        np.float32,
    )
    valid = np.array([[True, True, True, False]])
    kept = np.asarray(nms_keep_pallas(jnp.asarray(boxes), jnp.asarray(valid), 0.3, interpret=True))[0]
    assert kept.tolist() == [True, False, True, False]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fused_rotated_nms_kernel_matches_fixpoint(seed):
    """rotated_nms_keep_pallas == XLA probIoU fixpoint (the OBB serving path)."""
    import jax

    from yolo_infer_tpu.ops.nms import _nms_fixpoint
    from yolo_infer_tpu.ops.pallas.nms_fused import rotated_nms_keep_pallas
    from yolo_infer_tpu.ops.rotated import _cov, probiou_matrix

    rng = np.random.default_rng(seed)
    b, k = 2, 160  # non-multiple-of-128 K exercises lane padding
    cxy = rng.uniform(50, 590, (b, k, 2))
    wh = rng.uniform(10, 120, (b, k, 2))
    ang = rng.uniform(-np.pi / 2, np.pi / 2, (b, k, 1))
    rboxes = jnp.asarray(np.concatenate([cxy, wh, ang], -1).astype(np.float32))
    scores = -np.sort(-rng.uniform(0, 1, (b, k)).astype(np.float32), axis=1)
    valid = jnp.asarray(scores > 0.15)

    ca, cb_, cc = _cov(rboxes)
    gauss = jnp.stack([rboxes[..., 0], rboxes[..., 1], ca, cb_, cc], axis=-1)
    kept_pl = np.asarray(rotated_nms_keep_pallas(gauss, valid, 0.4, interpret=True))
    kept_fx = np.asarray(
        jax.vmap(
            lambda bx, va: _nms_fixpoint(probiou_matrix(bx, bx), va, jnp.float32(0.4), max_sweeps=k)
        )(rboxes, valid)
    )
    np.testing.assert_array_equal(kept_pl, kept_fx)
    assert kept_pl.any() and not kept_pl[~np.asarray(valid)].any()


@pytest.mark.parametrize("n,kd,hd,heads", [(400, 32, 64, 2), (64, 16, 32, 1)])
def test_fused_attention_kernel_matches_xla(n, kd, hd, heads):
    """attention_fused_pallas == the einsum/dot_general path (C2PSA serving)."""
    import jax

    from yolo_infer_tpu.ops.pallas.attention_fused import attention_fused_pallas

    rng = np.random.default_rng(0)
    g = 3 * heads
    qkv = jnp.asarray(rng.standard_normal((g, n, 2 * kd + hd)).astype(np.float32), jnp.bfloat16)
    got = np.asarray(attention_fused_pallas(qkv, kd, hd, interpret=True), np.float32)

    q, k, v = qkv[..., :kd], qkv[..., kd : 2 * kd], qkv[..., 2 * kd :]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * (kd ** -0.5)
    p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
    want = np.asarray(jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                          preferred_element_type=jnp.float32).astype(jnp.bfloat16), np.float32)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("n,kd,hd,heads", [(400, 32, 64, 2), (400, 32, 64, 4), (64, 16, 32, 1)])
def test_fused_qkv_attention_kernel_matches_xla(n, kd, hd, heads, b=3):
    """attention_qkv_fused_pallas on the raw head-major qkv slab == the
    apply_attention XLA math (pack -> batched dots -> f32 softmax -> unpack)."""
    import jax

    from yolo_infer_tpu.ops.pallas.attention_fused import attention_qkv_fused_pallas

    rng = np.random.default_rng(1)
    step = 2 * kd + hd
    qkv_raw = jnp.asarray(rng.standard_normal((b, n, heads * step)).astype(np.float32), jnp.bfloat16)
    got = np.asarray(attention_qkv_fused_pallas(qkv_raw, heads, kd, hd, interpret=True), np.float32)

    # reference: the blocks.apply_attention else-branch, head-major unpack
    qkv = qkv_raw.reshape(b, n, heads, step)
    q, k, v = qkv[..., :kd], qkv[..., kd : 2 * kd], qkv[..., 2 * kd :]
    qt = q.transpose(0, 2, 1, 3).reshape(b * heads, n, kd)
    kt = k.transpose(0, 2, 1, 3).reshape(b * heads, n, kd)
    vt = v.transpose(0, 2, 1, 3).reshape(b * heads, n, hd)
    s = jax.lax.dot_general(qt, kt, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * (kd ** -0.5)
    p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
    o = jax.lax.dot_general(p, vt, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    want = np.asarray(o.reshape(b, heads, n, hd).transpose(0, 2, 1, 3).reshape(b, n, heads * hd), np.float32)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("q_rows", [None, 32, 16])
def test_fused_qkv_attention_row_tiling_bit_exact(q_rows, n=64, kd=16, hd=32, heads=2, b=2):
    """Query-row tiling is bit-exact vs the whole-row kernel: softmax rows
    are independent, each block sees the full k/v slab. This is the VMEM
    escape hatch for imgsz 1280 (N=1600 at s/m slab width OOM'd the
    whole-row kernel's 16 MB scoped-VMEM stack in production, 2026-08-19)."""
    from yolo_infer_tpu.ops.pallas.attention_fused import attention_qkv_fused_pallas

    rng = np.random.default_rng(2)
    step = 2 * kd + hd
    qkv_raw = jnp.asarray(rng.standard_normal((b, n, heads * step)).astype(np.float32), jnp.bfloat16)
    whole = np.asarray(attention_qkv_fused_pallas(qkv_raw, heads, kd, hd, interpret=True, q_rows=n), np.float32)
    tiled = np.asarray(attention_qkv_fused_pallas(qkv_raw, heads, kd, hd, interpret=True, q_rows=q_rows), np.float32)
    np.testing.assert_array_equal(whole, tiled)


def test_pick_q_rows_vmem_gate():
    """pick_q_rows keeps small shapes whole, tiles 1280-scale shapes, and
    refuses shapes no tiling can fit — calibrated on the observed 1280
    compiles (n slab fit at 16 MB, s/m slab OOM'd at 16.48 M)."""
    from yolo_infer_tpu.ops.pallas.attention_fused import pick_q_rows

    assert pick_q_rows(400, 256, 128) == 400     # every size @640: whole row
    assert pick_q_rows(400, 512, 256) == 400
    for d_in, d_out in ((256, 128), (512, 256)):  # n and s/m/l/x @1280
        qr = pick_q_rows(1600, d_in, d_out)
        assert qr is not None and qr < 1600 and 1600 % qr == 0
    assert pick_q_rows(3600, 512, 256) is not None  # @1920 still tiles
    assert pick_q_rows(25, 2**22, 2**22) is None    # absurd width: fall back


def test_attn_impl_gate_falls_back_when_no_tiling_fits():
    """_attn_impl returns 'xla' when pick_q_rows finds no fitting tiling
    (and 'fused' requires a non-CPU backend, so force via the shape path)."""
    from yolo_infer_tpu.models.blocks import _attn_impl

    x = jnp.zeros((1, 5, 5, 8), jnp.bfloat16)
    assert _attn_impl(x, None, False, "auto", 25, 2**22, 2**22) == "xla"


def test_mask_pack_kernel_matches_xla_phase_path():
    """upsample4x_threshold_pack (interpret mode) == the XLA phase-decomposed
    reference on random soft masks, bit-exact."""
    import numpy as np

    import jax.numpy as jnp

    from yolo_infer_tpu.ops.masks import _upsample_threshold_pack
    from yolo_infer_tpu.ops.pallas.mask_pack import upsample4x_threshold_pack

    rng = np.random.default_rng(0)
    n, hm, wm = 8, 16, 16
    soft = rng.random((n, hm, wm)).astype(np.float32)
    want = np.asarray(_upsample_threshold_pack(jnp.asarray(soft), 4))
    got = np.asarray(
        upsample4x_threshold_pack(
            jnp.asarray(soft[..., 0::2]), jnp.asarray(soft[..., 1::2]), interpret=True
        )
    )
    np.testing.assert_array_equal(got, want)
