"""Architecture fidelity: param counts vs the published YOLO11 family,
forward shapes, BN-fold exactness, all task heads build and run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_infer_tpu.models import build_model, build_spec, fold_model, forward, param_count

# Published ultralytics YOLO11 parameter counts (detect task).
EXPECTED_PARAMS = {"n": 2_624_080, "s": 9_458_752, "m": 20_114_688, "l": 25_372_160, "x": 56_966_176}


@pytest.mark.parametrize("size", ["n", "s"])
def test_param_count_close(rng, size):
    params, _, _ = build_model(rng, "detect", size)
    n = param_count(params)
    # within 0.5% of the published count (BN gamma/beta counted, as torch does)
    assert abs(n - EXPECTED_PARAMS[size]) / EXPECTED_PARAMS[size] < 0.005, n


def test_detect_forward_shapes(tiny_detect_model):
    params, state, spec = tiny_detect_model
    x = jnp.zeros((2, 128, 128, 3))
    out, _ = forward(params, state, spec, x, compute_dtype=jnp.float32)
    shapes = [f.shape for f in out["feats"]]
    no = 4 * spec.reg_max + spec.nc
    assert shapes == [(2, 16, 16, no), (2, 8, 8, no), (2, 4, 4, no)]


def test_fold_batchnorm_exact(tiny_detect_model):
    params, state, spec = tiny_detect_model
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    out, _ = forward(params, state, spec, x, compute_dtype=jnp.float32)
    folded = fold_model(params, state)
    out2, _ = forward(folded, None, spec, x, compute_dtype=jnp.float32)
    for a, b in zip(out["feats"], out2["feats"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_training_mode_updates_bn_state(tiny_detect_model):
    params, state, spec = tiny_detect_model
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
    _, new_state = forward(params, state, spec, x, training=True, compute_dtype=jnp.float32)
    before = state["0"]["mean"]
    after = new_state["0"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


@pytest.mark.parametrize("task", ["segment", "pose", "obb", "classify"])
def test_task_heads(rng, task):
    params, state, spec = build_model(rng, task, "n")
    x = jnp.zeros((1, 64, 64, 3))
    out, _ = forward(params, state, spec, x, compute_dtype=jnp.float32)
    if task == "classify":
        assert out["logits"].shape == (1, 80)
        return
    assert len(out["feats"]) == 3
    if task == "segment":
        assert out["proto"].shape == (1, 16, 16, spec.nm)  # stride-4 proto grid
        assert out["mc"][0].shape[-1] == spec.nm
    if task == "pose":
        assert out["kpts"][0].shape[-1] == spec.kpt_shape[0] * spec.kpt_shape[1]
    if task == "obb":
        assert out["angle"][0].shape[-1] == spec.ne


def test_spec_c3k_override_for_large_sizes():
    spec_n = build_spec("detect", "n")
    spec_m = build_spec("detect", "m")
    # layer 2 (first C3k2) uses plain bottlenecks on n, C3k blocks on m/l/x
    assert spec_n.layers[2].kw["c3k"] is False
    assert spec_m.layers[2].kw["c3k"] is True
