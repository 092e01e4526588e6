"""Pruning + distillation optimizers (the capabilities the reference only
declares as abstract stubs, reference optimization/base.py:264-314 — this
build implements them: optimization/pruning.py, optimization/distillation.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from yolo_infer_tpu.core.model import YOLO11Model
from yolo_infer_tpu.optimization.pruning import (
    PruningOptimizer,
    apply_masks,
    channel_masks,
    gradual_sparsity_schedule,
    magnitude_masks,
    sparsity_report,
)


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("ds_pd")
    for split in ("train", "val"):
        img_dir = root / "images" / split
        lbl_dir = root / "labels" / split
        img_dir.mkdir(parents=True)
        lbl_dir.mkdir(parents=True)
        for i in range(4):
            img = np.full((64, 64, 3), 90, np.uint8)
            cv2.rectangle(img, (8, 8), (40, 48), (255, 40, 40), -1)
            cv2.imwrite(str(img_dir / f"im{i}.jpg"), img)
            (lbl_dir / f"im{i}.txt").write_text("0 0.375 0.4375 0.5 0.625\n")
    p = root / "data.yaml"
    p.write_text(yaml.safe_dump({"path": str(root), "train": "images/train", "val": "images/val", "names": {0: "box"}, "nc": 1}))
    return p


@pytest.fixture(scope="module")
def nano(synth_dataset):
    return YOLO11Model("yolo11n", nc=1, compute_dtype=jnp.float32)


# ------------------------------------------------------------------- masks


def test_magnitude_masks_hit_target_sparsity(nano):
    masks = magnitude_masks(nano.params, 0.5, scope="global")
    pruned = apply_masks(nano.params, masks)
    rep = sparsity_report(pruned)
    assert abs(rep["prunable_sparsity"] - 0.5) < 0.01, rep
    # head prediction convs ({'w','b'} leaves) untouched
    head = pruned["23"]
    for branch in ("cv2", "cv3"):
        final = head[branch][0][len(head[branch][0]) - 1]
        assert "gamma" not in final  # it IS the prediction conv
        assert (np.asarray(final["w"]) == np.asarray(nano.params["23"][branch][0][len(head[branch][0]) - 1]["w"])).all()


def test_unstructured_masks_per_layer(nano):
    masks = magnitude_masks(nano.params, 0.5, scope="layer")
    pruned = apply_masks(nano.params, masks)
    # every individual prunable conv is close to the target (global can skew)
    from yolo_infer_tpu.optimization.pruning import _walk_prunable

    for conv in list(_walk_prunable(pruned))[:10]:
        w = np.asarray(conv["w"])
        if w.size >= 16:
            frac = (w == 0).mean()
            assert 0.3 < frac < 0.7, frac


def test_channel_masks_kill_whole_channels(nano):
    masks = channel_masks(nano.params, 0.5)
    pruned = apply_masks(nano.params, masks)
    conv1 = pruned["1"]
    w = np.asarray(conv1["w"])  # (3,3,16,32)
    dead = np.where((w == 0).all(axis=(0, 1, 2)))[0]
    assert len(dead) == w.shape[-1] // 2
    # BN affine zeroed on the same channels -> channel output is SiLU(0) = 0
    assert (np.asarray(conv1["gamma"])[dead] == 0).all()
    assert (np.asarray(conv1["beta"])[dead] == 0).all()
    live = np.setdiff1d(np.arange(w.shape[-1]), dead)
    assert (np.asarray(conv1["gamma"])[live] != 0).all()


def test_pruned_forward_finite(nano):
    opt = PruningOptimizer(nano, {"method": "structured", "sparsity": 0.4})
    pruned = opt.optimize()
    assert pruned is not nano
    res = pruned.predict(np.zeros((64, 64, 3), np.uint8), imgsz=64)
    assert res is not None
    info = opt.get_optimization_info()
    assert info["after"]["prunable_sparsity"] > info["before"]["prunable_sparsity"]
    # the original model's params are untouched
    assert sparsity_report(nano.params)["prunable_sparsity"] < 0.01


def test_magnitude_masks_exact_under_ties(nano):
    """All-equal magnitudes must still hit the target count (argpartition
    exact-k, not a >=-threshold that keeps every tied weight; ADVICE r3)."""
    tied = jax.tree_util.tree_map(lambda x: jnp.ones_like(x), nano.params)
    masks = magnitude_masks(tied, 0.5, scope="layer")
    rep = sparsity_report(apply_masks(tied, masks))
    assert abs(rep["prunable_sparsity"] - 0.5) < 0.01, rep


def test_fused_magnitude_prune_actually_prunes(nano):
    """Mask pruning on a FUSED deploy tree must zero weights, not silently
    no-op through the all-ones-mask path (ADVICE r3 medium)."""
    fused = YOLO11Model.from_params(
        jax.tree_util.tree_map(jnp.copy, nano.deploy_params),
        task="detect", size="n", nc=1, fused=True, compute_dtype=jnp.float32,
    )
    opt = PruningOptimizer(fused, {"method": "magnitude", "sparsity": 0.5})
    pruned = opt.optimize()
    info = opt.get_optimization_info()
    assert info["after"]["prunable_sparsity"] > 0.45, info["after"]
    # prediction convs excluded: the last conv of each head branch untouched
    head = pruned.params["23"]
    for branch in ("cv2", "cv3"):
        final = head[branch][0][-1]
        ref = fused.params["23"][branch][0][-1]
        assert (np.asarray(final["w"]) == np.asarray(ref["w"])).all()


def test_fused_structured_prune_zeroes_bias_too(nano):
    fused_params = jax.tree_util.tree_map(jnp.copy, nano.deploy_params)
    masks = channel_masks(fused_params, 0.5, fused=True)
    pruned = apply_masks(fused_params, masks)
    conv1 = pruned["1"]
    w = np.asarray(conv1["w"])
    dead = np.where((w == 0).all(axis=(0, 1, 2)))[0]
    assert len(dead) == w.shape[-1] // 2
    # folded bias zeroed on the same channels -> channel output is SiLU(0)=0
    assert (np.asarray(conv1["b"])[dead] == 0).all()


def test_fused_prune_with_data_raises_early(nano, synth_dataset):
    fused = YOLO11Model.from_params(
        nano.deploy_params, task="detect", size="n", nc=1, fused=True,
        compute_dtype=jnp.float32,
    )
    opt = PruningOptimizer(fused, {"method": "magnitude", "sparsity": 0.5})
    with pytest.raises(ValueError, match="unfused"):
        opt.optimize(data=str(synth_dataset), epochs=1)


def test_gradual_schedule_is_cubic():
    assert gradual_sparsity_schedule(0.0, 0.8, 0.0) == 0.0
    assert gradual_sparsity_schedule(0.0, 0.8, 1.0) == pytest.approx(0.8)
    mid = gradual_sparsity_schedule(0.0, 0.8, 0.5)
    assert 0.8 * 0.5 < mid < 0.8  # front-loaded


def test_prune_fine_tune_mask_enforced(synth_dataset, tmp_path):
    """After fine-tuning, pruned coordinates are EXACTLY zero (in-graph mask)."""
    model = YOLO11Model("yolo11n", nc=1, compute_dtype=jnp.float32)
    opt = PruningOptimizer(model, {"method": "magnitude", "sparsity": 0.5})
    pruned = opt.optimize(
        data=str(synth_dataset), epochs=1, batch=2, imgsz=64, max_boxes=8,
        val=False, project=str(tmp_path / "runs"), name="p", patience=0,
    )
    rep = sparsity_report(pruned.params)
    assert rep["prunable_sparsity"] >= 0.49, rep
    # and the weights actually trained: live coords moved
    moved = 0
    for a, b in zip(jax.tree_util.tree_leaves(model.params), jax.tree_util.tree_leaves(pruned.params)):
        moved += int((np.asarray(a) != np.asarray(b)).sum())
    assert moved > 0


def test_gradual_prune_rounds(synth_dataset, tmp_path):
    model = YOLO11Model("yolo11n", nc=1, compute_dtype=jnp.float32)
    opt = PruningOptimizer(model, {"method": "gradual", "sparsity": 0.6, "prune_rounds": 2})
    pruned = opt.optimize(
        data=str(synth_dataset), epochs=2, batch=2, imgsz=64, max_boxes=8,
        val=False, project=str(tmp_path / "runs"), name="g", patience=0,
    )
    rep = sparsity_report(pruned.params)
    assert rep["prunable_sparsity"] >= 0.59, rep
    info = opt.get_optimization_info()
    assert len(info["fine_tune"]) == 2
    assert info["fine_tune"][0]["sparsity"] < info["fine_tune"][1]["sparsity"]


# ------------------------------------------------------------- distillation


def test_distill_detect_loss_zero_when_equal():
    from yolo_infer_tpu.core.losses import distill_detect_loss

    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.normal(size=(2, s, s, 64 + 3)).astype(np.float32)) for s in (8, 4, 2)]
    loss, parts = distill_detect_loss(feats, feats, nc=3, reg_max=16)
    assert float(loss) == pytest.approx(0.0, abs=1e-5)
    loss2, _ = distill_detect_loss(
        [f + 1.0 * jnp.sign(f) for f in feats], feats, nc=3, reg_max=16
    )
    assert float(loss2) > 1e-3


def test_distill_classify_loss_matches_hinton():
    from yolo_infer_tpu.core.losses import distill_classify_loss

    t = jnp.asarray([[2.0, 0.0, -2.0]])
    s = jnp.asarray([[0.0, 0.0, 0.0]])
    val = float(distill_classify_loss(s, t, temperature=1.0))
    # manual KL(softmax(t) || softmax(s))
    pt = np.exp([2.0, 0.0, -2.0]) / np.exp([2.0, 0.0, -2.0]).sum()
    manual = float((pt * (np.log(pt) - np.log(np.ones(3) / 3))).sum())
    assert val == pytest.approx(manual, rel=1e-5)
    assert float(distill_classify_loss(t, t, temperature=4.0)) == pytest.approx(0.0, abs=1e-6)


def test_distillation_end_to_end(synth_dataset, tmp_path):
    from yolo_infer_tpu.optimization.distillation import DistillationOptimizer

    student = YOLO11Model("yolo11n", nc=1, compute_dtype=jnp.float32)
    teacher = YOLO11Model("yolo11n", nc=1, seed=7, compute_dtype=jnp.float32)
    opt = DistillationOptimizer(student, {"temperature": 2.0, "alpha": 0.5})
    out = opt.optimize(
        data=str(synth_dataset), teacher=teacher, epochs=1, batch=2, imgsz=64,
        max_boxes=8, val=False, mosaic=0.0, project=str(tmp_path / "runs"), name="d", patience=0,
    )
    info = opt.get_optimization_info()
    assert info["final_loss_kd"] is not None and np.isfinite(info["final_loss_kd"])
    assert out is opt.optimized_model
    # student trained, original untouched
    assert any(
        (np.asarray(a) != np.asarray(b)).any()
        for a, b in zip(jax.tree_util.tree_leaves(student.params), jax.tree_util.tree_leaves(out.params))
    )


def test_distillation_teacher_mismatch_raises():
    from yolo_infer_tpu.optimization.distillation import DistillationOptimizer

    student = YOLO11Model("yolo11n", nc=1, compute_dtype=jnp.float32)
    teacher = YOLO11Model("yolo11n-pose", nc=1, compute_dtype=jnp.float32)
    with pytest.raises(ValueError, match="task"):
        DistillationOptimizer(student, {}).optimize(data="x", teacher=teacher)
    with pytest.raises(ValueError, match="teacher"):
        DistillationOptimizer(student, {}).optimize(data="x")


def test_registry_has_all_methods():
    import yolo_infer_tpu.optimization as opt

    names = opt.OptimizationRegistry.available()
    for n in ("dynamic", "ptq", "qat", "prune", "distill"):
        assert n in names, names
