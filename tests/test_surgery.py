"""Physical channel surgery (optimization/surgery.py).

The load-bearing invariant: removing a channel group must be EXACTLY
equivalent to zeroing its producers (w, gamma, beta[, b]) — BN of a zeroed
channel emits 0, SiLU(0)=0, and zero channels contribute nothing through any
consumer. `zero_removed` builds the masked twin; forward outputs must match
to float32 tolerance. This goes beyond the reference's pruning surface
(reference optimization/base.py:264-288, a declared stub): masked models run
at dense speed, slimmed models are genuinely smaller compiled programs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_infer_tpu.models.yolo11 import build_model, fold_model, forward, param_count
from yolo_infer_tpu.optimization.surgery import build_plan, slim_model, zero_removed


def _perturbed(task="detect", size="n", seed=0):
    params, state, spec = build_model(jax.random.PRNGKey(seed), task, size, 80)
    # shift BN running stats so BN(0) != 0 unless gamma/beta are zeroed —
    # makes the slim == zero equivalence non-trivial
    state = jax.tree_util.tree_map(lambda v: v + 0.3 if v.ndim == 1 else v, state)
    return params, state, spec


def _max_delta(a, b):
    d = 0.0
    for k in a:
        la = a[k] if isinstance(a[k], list) else [a[k]]
        lb = b[k] if isinstance(b[k], list) else [b[k]]
        for x, y in zip(la, lb):
            d = max(d, float(jnp.max(jnp.abs(x - y))))
    return d


@pytest.mark.parametrize("task", ["detect", "segment", "pose", "obb", "classify"])
def test_slim_equals_zeroed_forward(task):
    params, state, spec = _perturbed(task)
    sp, ss, plan, rep = slim_model(params, state, spec, keep_frac=0.5)
    zp, zs = zero_removed(params, state, plan)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
    out_s, _ = forward(sp, ss, spec, x, compute_dtype=jnp.float32)
    out_z, _ = forward(zp, zs, spec, x, compute_dtype=jnp.float32)
    assert _max_delta(out_s, out_z) < 1e-4
    assert rep["params_after"] < rep["params_before"]
    assert rep["params_ratio"] < 0.8  # >20% of weights physically gone


def test_slim_fused_tree():
    params, state, spec = _perturbed()
    fused = fold_model(params, state)
    fp, fs, plan, rep = slim_model(fused, None, spec, keep_frac=0.5)
    assert fs is None
    zp, _ = zero_removed(fused, None, plan)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    of, _ = forward(fp, None, spec, x, compute_dtype=jnp.float32)
    oz, _ = forward(zp, None, spec, x, compute_dtype=jnp.float32)
    assert _max_delta(of, oz) < 1e-4


def test_alignment_and_monotonicity():
    params, state, spec = _perturbed()
    plan = build_plan(params, spec, keep_frac=0.5, align=8)
    for g in plan:
        if g.keep is not None:
            assert g.kept % 8 == 0, g.name
            assert 0 < g.kept < g.width
            # keep indices sorted + unique (order preserved for splits/concats)
            assert np.all(np.diff(g.keep) > 0)
    # lower keep_frac never keeps more
    plan25 = build_plan(params, spec, keep_frac=0.25, align=8)
    for g50, g25 in zip(plan, plan25):
        assert g25.kept <= g50.kept


def test_interfaces_untouched():
    """Every head output map keeps its channel count; only internals shrink."""
    params, state, spec = _perturbed("segment")
    sp, ss, _, _ = slim_model(params, state, spec, keep_frac=0.25)
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 64, 64, 3))
    out_full, _ = forward(params, state, spec, x, compute_dtype=jnp.float32)
    out_slim, _ = forward(sp, ss, spec, x, compute_dtype=jnp.float32)
    for a, b in zip(out_full["feats"], out_slim["feats"]):
        assert a.shape == b.shape
    assert out_full["proto"].shape == out_slim["proto"].shape


def test_chunk_surgery_m_scale():
    """c3k=True everywhere at m-scale: chain-link groups + split2 pairing."""
    params, state, spec = _perturbed("detect", "m")
    sp, ss, plan, rep = slim_model(params, state, spec, keep_frac=0.5)
    zp, zs = zero_removed(params, state, plan)
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 64, 3))
    out_s, _ = forward(sp, ss, spec, x, compute_dtype=jnp.float32)
    out_z, _ = forward(zp, zs, spec, x, compute_dtype=jnp.float32)
    assert _max_delta(out_s, out_z) < 2e-4
    assert rep["params_ratio"] < 0.7
    # paired chunk groups keep equal counts (q_split2 halves stay exact)
    by_name = {g.name: g for g in plan}
    pairs = [(n, n.replace(":chunk_a", ":chunk_b")) for n in by_name if n.endswith(":chunk_a")]
    assert pairs
    for a, b in pairs:
        assert by_name[a].kept == by_name[b].kept


def test_chain_link_surgery_l_scale():
    """l/x have n_m=2 C3k chains: the y_i -> m[i+1] chain-link consumer path
    (untaken at n/s/m where repeats resolve to 1) must stay equivalent."""
    params, state, spec = _perturbed("detect", "l")
    plan = build_plan(params, spec, keep_frac=0.5)
    assert any(":y1" in g.name for g in plan)  # the path is actually exercised
    sp, ss, plan, rep = slim_model(params, state, spec, keep_frac=0.5)
    zp, zs = zero_removed(params, state, plan)
    x = jax.random.uniform(jax.random.PRNGKey(6), (1, 64, 64, 3))
    a, _ = forward(sp, ss, spec, x, compute_dtype=jnp.float32)
    b, _ = forward(zp, zs, spec, x, compute_dtype=jnp.float32)
    assert _max_delta(a, b) < 2e-4
    assert rep["params_ratio"] < 0.65


def test_chunks_flag_off_is_gentler():
    params, state, spec = _perturbed()
    _, _, _, rep_all = slim_model(params, state, spec, keep_frac=0.5, chunks=True)
    _, _, _, rep_inner = slim_model(params, state, spec, keep_frac=0.5, chunks=False)
    assert rep_all["params_after"] < rep_inner["params_after"] < rep_inner["params_before"]


def test_quantized_tree_rejected():
    params, state, spec = _perturbed()
    params["0"]["w_q"] = params["0"]["w"]
    with pytest.raises(ValueError, match="float weights"):
        build_plan(params, spec)


def test_pruner_physical_end_to_end(tmp_path):
    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.optimization.pruning import PruningOptimizer

    model = YOLO11Model("yolo11n", nc=3, compute_dtype=jnp.float32)
    n0 = param_count(model.params)
    opt = PruningOptimizer(model, {"method": "structured", "physical": True, "sparsity": 0.5})
    slim = opt.optimize()
    assert param_count(slim.params) < 0.8 * n0
    info = opt.get_optimization_info()
    assert info["method"] == "structured-physical"
    # slimmed model predicts (batched fixed-shape path) and round-trips
    img = (np.random.default_rng(0).uniform(0, 255, (96, 96, 3))).astype(np.uint8)
    res = slim.predict(img, conf=0.01, imgsz=64)
    assert len(res) == 1
    p = slim.save(tmp_path / "slim.msgpack")
    re = YOLO11Model(p)
    assert param_count(re.params) == param_count(slim.params)
    r2 = re.predict(img, conf=0.01, imgsz=64)
    assert res[0].boxes.shape == r2[0].boxes.shape


def test_physical_fine_tune(tmp_path):
    """Slim then plain fine-tune: the smaller tree trains without masks."""
    import cv2
    import yaml

    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.optimization.pruning import PruningOptimizer

    root = tmp_path / "ds"
    for split in ("train", "val"):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        for i in range(4):
            img = np.full((64, 64, 3), 90, np.uint8)
            cv2.rectangle(img, (8, 8), (40, 48), (255, 40, 40), -1)
            cv2.imwrite(str(root / "images" / split / f"im{i}.jpg"), img)
            (root / "labels" / split / f"im{i}.txt").write_text("0 0.375 0.4375 0.5 0.625\n")
    data = root / "data.yaml"
    data.write_text(yaml.safe_dump(
        {"path": str(root), "train": "images/train", "val": "images/val", "names": {0: "box"}, "nc": 1}))

    model = YOLO11Model("yolo11n", nc=1, compute_dtype=jnp.float32)
    opt = PruningOptimizer(model, {"method": "structured", "physical": True, "sparsity": 0.5})
    slim = opt.optimize(data=str(data), epochs=1, imgsz=64, batch=4,
                        project=str(tmp_path / "runs"), val=False)
    info = opt.get_optimization_info()
    assert info["fine_tune"] is not None
    assert info["fine_tune"]["epochs_completed"] == 1
    assert param_count(slim.params) < param_count(model.params)


def test_slim_sharded_serving_matches_single_device():
    """The slimmed tree serves DP-sharded over a mesh (GSPMD handles the
    surgically-changed shapes; shard_params never sees spec-derived dims)."""
    from yolo_infer_tpu.core.predictor import Predictor
    from yolo_infer_tpu.parallel.mesh import create_mesh

    params, state, spec = _perturbed()
    fused = fold_model(params, state)
    sp, _, _, _ = slim_model(fused, None, spec, keep_frac=0.5)
    mesh = create_mesh(n_devices=8)
    single = Predictor(sp, spec, compute_dtype=jnp.float32)
    sharded = Predictor(sp, spec, compute_dtype=jnp.float32, mesh=mesh)
    imgs = jnp.asarray(np.random.default_rng(0).integers(0, 255, (8, 64, 64, 3), dtype=np.uint8))
    a = single.predict_raw(imgs, 0.0001, 0.5, 64)
    b = sharded.predict_raw(imgs, 0.0001, 0.5, 64)
    np.testing.assert_array_equal(np.asarray(a["num"]), np.asarray(b["num"]))
    np.testing.assert_allclose(np.asarray(a["scores"]), np.asarray(b["scores"]), atol=1e-5)


def test_slim_then_ptq_int8():
    """Surgery composes with static8 PTQ: quantize the slimmed tree."""
    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.optimization.pruning import PruningOptimizer
    from yolo_infer_tpu.optimization.quantization.quantizers import PostTrainingQuantizer

    model = YOLO11Model("yolo11n", nc=3)
    slim = PruningOptimizer(model, {"method": "structured", "physical": True, "sparsity": 0.5}).optimize()
    q = PostTrainingQuantizer(slim, {"imgsz": 64})
    rng = np.random.default_rng(0)
    q.set_calibration_data([rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)])
    qslim = q.optimize()
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    res = qslim.predict(img, conf=0.01, imgsz=64)
    assert len(res) == 1 and np.isfinite(np.asarray(res[0].boxes)).all()


def test_physical_requires_structured():
    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.optimization.pruning import PruningOptimizer

    model = YOLO11Model("yolo11n", nc=3, compute_dtype=jnp.float32)
    with pytest.raises(ValueError, match="structured"):
        PruningOptimizer(model, {"method": "magnitude", "physical": True})
