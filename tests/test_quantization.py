"""int8 quantization: primitives, dynamic/PTQ quantizers, registry, persistence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_infer_tpu.nn.quantize import (
    dequantize_weights,
    fake_quantize,
    quantize_params_tree,
    quantize_weights_per_channel,
)
from yolo_infer_tpu.optimization.base import OptimizationRegistry, OptimizationPipeline
from yolo_infer_tpu.optimization.quantization.quantizers import (
    DynamicQuantizer,
    PostTrainingQuantizer,
    QuantizationUtils,
    create_quantizer,
)


def test_weight_quant_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 16, 32)).astype(np.float32))
    w_q, scale = quantize_weights_per_channel(w)
    assert w_q.dtype == jnp.int8 and scale.shape == (32,)
    back = dequantize_weights(w_q, scale)
    err = np.abs(np.asarray(back - w))
    assert err.max() <= np.asarray(scale).max() / 2 + 1e-6  # within half a quant step


def test_fake_quantize_ste_gradient():
    x = jnp.linspace(-1, 1, 8)
    g = jax.grad(lambda v: jnp.sum(fake_quantize(v, jnp.float32(0.01))))(x)
    np.testing.assert_allclose(np.asarray(g), 1.0)  # straight-through


@pytest.fixture(scope="module")
def float_model():
    from yolo_infer_tpu.core.model import YOLO11Model

    return YOLO11Model("yolo11n", compute_dtype=jnp.float32)


def test_quantize_params_tree_dtypes(float_model):
    q = quantize_params_tree(float_model.deploy_params)
    assert q["0"]["w_q"].dtype == jnp.int8
    assert "w_scale" in q["0"]
    # head final convs (conv2d_bias, inside Detect lists) keep float weights
    leaves = jax.tree_util.tree_leaves(q)
    assert any(l.dtype == jnp.int8 for l in leaves)


def test_dynamic_quantizer_outputs_close(float_model):
    from yolo_infer_tpu.models.yolo11 import forward

    q = DynamicQuantizer(float_model)
    qmodel = q.optimize()
    assert QuantizationUtils.is_quantized(qmodel)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    ref, _ = forward(float_model.deploy_params, None, float_model.spec, x, compute_dtype=jnp.float32)
    got, _ = forward(qmodel.deploy_params, None, qmodel.spec, x, compute_dtype=jnp.float32)
    for a, b in zip(ref["feats"], got["feats"]):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(a).mean() + 1e-6
        assert np.abs(a - b).mean() / denom < 0.35, np.abs(a - b).mean() / denom


def test_dynamic_quantizer_predict_runs(float_model):
    qmodel = DynamicQuantizer(float_model).optimize()
    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    res = qmodel.predict(img, conf=0.0001, imgsz=64)
    assert len(res) == 1


def test_ptq_calibration_and_predict(float_model):
    q = PostTrainingQuantizer(float_model, {"imgsz": 64})
    rng = np.random.default_rng(0)
    q.set_calibration_data([rng.integers(0, 255, (1, 64, 64, 3), dtype=np.uint8) for _ in range(3)])
    qmodel = q.optimize()
    scales = np.asarray(qmodel.quant_act_scales)
    # one (input, output) absmax pair per QUANTIZED conv (int8-residency path)
    assert scales.ndim == 2 and scales.shape[1] == 2 and scales.shape[0] > 30
    assert (scales > 0).all()
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    res = qmodel.predict(img, conf=0.0001, imgsz=64)
    assert len(res) == 1
    info = q.get_optimization_info()
    assert info["method"] == "ptq" and info["num_observed_convs"] == len(scales)


def test_ptq_static8_outputs_close(float_model):
    """The int8-residency forward tracks the fp32 forward closely."""
    from yolo_infer_tpu.models.yolo11 import forward
    from yolo_infer_tpu.nn.quantize import QAct, QuantContext, quant_context

    q = PostTrainingQuantizer(float_model, {"imgsz": 64})
    rng = np.random.default_rng(7)
    calib = [rng.integers(0, 255, (1, 64, 64, 3), dtype=np.uint8) for _ in range(4)]
    q.set_calibration_data(calib)
    qmodel = q.optimize()

    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    ref, _ = forward(float_model.deploy_params, None, float_model.spec, x, compute_dtype=jnp.float32)
    with quant_context(QuantContext("static8", act_scales=qmodel.quant_act_scales)):
        got, _ = forward(qmodel.deploy_params, None, qmodel.spec, x, compute_dtype=jnp.float32)
    for a, b in zip(ref["feats"], got["feats"]):
        a, b = np.asarray(a), np.asarray(b)
        assert not isinstance(b, QAct)  # head outputs are float
        denom = np.abs(a).mean() + 1e-6
        assert np.abs(a - b).mean() / denom < 0.35, np.abs(a - b).mean() / denom


def test_static8_c64_eligibility_is_rows_keyed():
    """C=64 convs quantize only when rows = N*H*W clears int8_c64_min_rows.

    Shape-aware generalization of the old batch>=64 rule (VERDICT r3 #9):
    the SAME batch must flip eligibility when the spatial extent changes,
    so int8 cannot silently lose at non-640 image sizes.
    """
    from yolo_infer_tpu.nn.layers import conv_block
    from yolo_infer_tpu.nn.quantize import (
        QAct,
        QuantContext,
        quant_context,
        quantize_weights_per_channel,
    )

    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 64, 64)).astype(np.float32))
    w_q, w_scale = quantize_weights_per_channel(w)
    params = {"w_q": w_q, "w_scale": w_scale, "b": jnp.zeros((64,), jnp.float32)}
    scales = jnp.asarray([[1.0, 1.0]], jnp.float32)

    def run(n, hw, min_rows):
        x = jnp.asarray(rng.normal(0, 1, (n, hw, hw, 64)).astype(np.float32))
        ctx = QuantContext("static8", act_scales=scales)
        ctx.int8_c64_min_rows = min_rows
        with quant_context(ctx):
            y, _ = conv_block(params, None, x)
        return y

    # below the volume boundary: exempt -> plain float output
    assert not isinstance(run(2, 8, min_rows=2 * 8 * 8 + 1), QAct)
    # same batch, bigger spatial extent -> quantized (QAct residency)
    assert isinstance(run(2, 16, min_rows=2 * 8 * 8 + 1), QAct)
    # same spatial, bigger batch -> quantized too (the old rule's axis)
    assert isinstance(run(4, 8, min_rows=4 * 8 * 8), QAct)


def test_ptq_requires_calibration(float_model):
    with pytest.raises(RuntimeError, match="calibration"):
        PostTrainingQuantizer(float_model).optimize()


def test_quantized_save_load_roundtrip(float_model, tmp_path):
    from yolo_infer_tpu.core.model import YOLO11Model

    q = PostTrainingQuantizer(float_model, {"imgsz": 64})
    q.set_calibration_data([np.zeros((1, 64, 64, 3), np.uint8)])
    qmodel = q.optimize()
    path = q.save_optimized_model(tmp_path / "q.msgpack")
    loaded = YOLO11Model(path, compute_dtype=jnp.float32)
    assert loaded.quant_act_scales is not None
    assert QuantizationUtils.is_quantized(loaded)
    img = np.random.default_rng(1).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    a = qmodel.predict(img, conf=0.0001, imgsz=64)[0]
    b = loaded.predict(img, conf=0.0001, imgsz=64)[0]
    assert len(a) == len(b)


def test_registry_and_factory(float_model):
    assert set(OptimizationRegistry.available()) >= {"dynamic", "ptq", "qat"}
    assert isinstance(create_quantizer("dynamic", float_model), DynamicQuantizer)
    with pytest.raises(ValueError):
        create_quantizer("nope", float_model)


def test_size_compression(float_model):
    qmodel = DynamicQuantizer(float_model).optimize()
    sizes = QuantizationUtils.compare_model_sizes(float_model, qmodel)
    assert sizes["compression_ratio"] > 2.0  # fp32 -> int8 on conv weights


def test_pipeline(float_model):
    pipe = OptimizationPipeline(float_model).add_step(DynamicQuantizer(float_model))
    out = pipe.run()
    assert QuantizationUtils.is_quantized(out)
    assert pipe.results[0]["optimizer"] == "DynamicQuantizer"


def test_ptq_serving_all_tasks():
    """PTQ int8 predict works for every task family (reference quantizes any
    loaded model via torch backends — parity demands the same coverage)."""
    import numpy as np

    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.core.predictor import Results
    from yolo_infer_tpu.optimization.quantization.quantizers import PostTrainingQuantizer

    rng = np.random.default_rng(0)
    for task in ("seg", "pose", "obb", "cls"):
        m = YOLO11Model(f"yolo11n-{task}")
        q = PostTrainingQuantizer(m, {"imgsz": 160})
        q.set_calibration_data([rng.integers(0, 255, (1, 160, 160, 3), dtype=np.uint8)])
        qm = q.optimize()
        r = qm.predict(rng.integers(0, 255, (1, 160, 160, 3), dtype=np.uint8), conf=0.01, imgsz=160)
        assert isinstance(r, list) and isinstance(r[0], Results), task
