"""Pallas fused int8 conv: exact agreement with the XLA static8 path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_infer_tpu.ops.pallas.int8_conv import eligible, int8_conv3x3_fused, xla_reference


@pytest.mark.parametrize("shape", [(2, 16, 16, 32, 32), (1, 8, 8, 64, 32)])
def test_matches_xla_reference(shape):
    b, h, w, ci, co = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (b, h, w, ci)), jnp.int8)
    wq = jnp.asarray(rng.integers(-20, 21, (3, 3, ci, co)), jnp.int8)
    scale = jnp.asarray(rng.uniform(1e-3, 2e-3, (co,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, (co,)), jnp.float32)
    sy = jnp.float32(0.02)

    ref = xla_reference(x, wq, scale, bias, sy)
    got = int8_conv3x3_fused(x, wq, scale, bias, sy, interpret=True)
    # identical quantization arithmetic -> at most 1 code of rounding skew
    diff = np.abs(np.asarray(ref, np.int32) - np.asarray(got, np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


def test_no_activation_variant():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(-10, 10, (1, 8, 8, 32)), jnp.int8)
    wq = jnp.asarray(rng.integers(-5, 6, (3, 3, 32, 32)), jnp.int8)
    scale = jnp.full((32,), 1e-3, jnp.float32)
    sy = jnp.float32(0.01)
    ref = xla_reference(x, wq, scale, None, sy, act=False)
    got = int8_conv3x3_fused(x, wq, scale, None, sy, act=False, interpret=True)
    diff = np.abs(np.asarray(ref, np.int32) - np.asarray(got, np.int32))
    assert diff.max() <= 1


def test_eligibility_rules():
    assert eligible(80, 80, 64, 64, 3, 1, 1)
    assert eligible(40, 40, 128, 128, 3, 1, 1)
    assert not eligible(80, 80, 64, 64, 1, 1, 1)  # 1x1: XLA matmul path
    assert not eligible(80, 80, 64, 64, 3, 2, 1)  # stride 2
    assert not eligible(80, 80, 64, 64, 3, 1, 64)  # depthwise
    assert not eligible(640, 640, 16, 16, 3, 1, 1)  # ci < 32 (stem region)
