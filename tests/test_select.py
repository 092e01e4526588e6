"""Anchor-row selection (ops/select.py): impl equivalence + tail refactor.

The pose/segment serving tails select max_det anchor rows post-NMS. The
one-hot MXU formulation must be BIT-exact vs the gather (a one-hot row sum
touches exactly one nonzero product), and select-then-decode must equal the
old decode-then-select tail exactly (the decode is elementwise per row).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_infer_tpu.ops.select import select_anchor_rows


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_select_impls_bit_exact(dtype):
    rng = np.random.default_rng(0)
    b, a, d, k = 3, 257, 51, 17
    x = jnp.asarray(rng.normal(size=(b, a, d)).astype(np.float32), dtype)
    idx = jnp.asarray(rng.integers(0, a, (b, k)), jnp.int32)
    g = select_anchor_rows(x, idx, impl="gather")
    o = select_anchor_rows(x, idx, impl="onehot")
    assert g.shape == (b, k, d) and g.dtype == dtype
    np.testing.assert_array_equal(np.asarray(g, np.float32), np.asarray(o, np.float32))
    # oracle
    want = np.stack([np.asarray(x, np.float32)[i][np.asarray(idx)[i]] for i in range(b)])
    np.testing.assert_array_equal(np.asarray(g, np.float32), want)


def test_select_shared_table():
    """(A, D) tables (anchor points / strides) broadcast across the batch."""
    rng = np.random.default_rng(1)
    a, d, b, k = 100, 3, 2, 5
    t = jnp.asarray(rng.normal(size=(a, d)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, a, (b, k)), jnp.int32)
    g = select_anchor_rows(t, idx, impl="gather")
    o = select_anchor_rows(t, idx, impl="onehot")
    np.testing.assert_array_equal(np.asarray(g), np.asarray(o))
    np.testing.assert_array_equal(np.asarray(g), np.asarray(t)[np.asarray(idx)])


def test_pose_select_then_decode_matches_full_decode():
    """Decoding only the selected rows == decoding the grid then gathering
    (same elementwise ops on the same values), bit-exact."""
    from yolo_infer_tpu.ops.decode import decode_keypoints, make_anchors

    rng = np.random.default_rng(2)
    feat_shapes = [(8, 8), (4, 4), (2, 2)]
    strides = (8, 16, 32)
    a = sum(h * w for h, w in feat_shapes)
    b, md = 2, 7
    kflat = jnp.asarray(rng.normal(size=(b, a, 51)).astype(np.float32), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, a, (b, md)), jnp.int32)
    ap, st = make_anchors(feat_shapes, strides)

    full = decode_keypoints(kflat, ap, st)  # (B, A, 17, 3)
    want = jnp.take_along_axis(full, idx[..., None, None], axis=1)

    ksel = select_anchor_rows(kflat, idx, impl="onehot")
    apst = select_anchor_rows(jnp.concatenate([ap, st], axis=-1), idx, impl="onehot")
    got = decode_keypoints(ksel, apst[..., :2], apst[..., 2:])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pose_predict_rowsel_impls_agree(monkeypatch):
    """End-to-end pose serving output is identical under either row-select
    impl (YOLO_TPU_ROWSEL is read at trace time)."""
    from yolo_infer_tpu.core.predictor import Predictor
    from yolo_infer_tpu.models import build_model, fold_model

    params, state, spec = build_model(jax.random.PRNGKey(0), "pose", "n", nc=2)
    deploy = fold_model(params, state)
    imgs = jnp.asarray(np.random.default_rng(3).integers(0, 255, (2, 64, 64, 3), dtype=np.uint8))
    outs = {}
    for impl in ("gather", "onehot"):
        monkeypatch.setenv("YOLO_TPU_ROWSEL", impl)
        p = Predictor(deploy, spec, compute_dtype=jnp.float32)
        outs[impl] = jax.tree_util.tree_map(np.asarray, p.predict_raw(imgs, 0.001, 0.45, 64))
    assert set(outs["gather"]) == set(outs["onehot"])
    for k in outs["gather"]:
        np.testing.assert_array_equal(outs["gather"][k], outs["onehot"][k], err_msg=k)
