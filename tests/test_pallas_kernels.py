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
