"""Detection loss + task-aligned assigner."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_infer_tpu.core.losses import detection_loss, task_aligned_assigner


def _fake_batch(b=2, m=8, imgsz=64):
    boxes = np.zeros((b, m, 4), np.float32)
    classes = np.zeros((b, m), np.int32)
    mask = np.zeros((b, m), bool)
    boxes[:, 0] = [8, 8, 40, 48]
    classes[:, 0] = 3
    mask[:, 0] = True
    return {"boxes": jnp.asarray(boxes), "classes": jnp.asarray(classes), "mask": jnp.asarray(mask)}


def _fake_feats(b=2, imgsz=64, nc=80, reg_max=16):
    rng = np.random.default_rng(0)
    feats = []
    for s in (8, 16, 32):
        h = imgsz // s
        feats.append(jnp.asarray(rng.normal(0, 0.5, (b, h, h, 4 * reg_max + nc)).astype(np.float32)))
    return feats


def test_assigner_assigns_inside_anchors():
    b, a, nc, m = 1, 64, 4, 4
    # anchors on an 8x8 grid of stride 8 (pixels 4..60)
    xs = (np.arange(8) + 0.5) * 8
    pts = np.stack(np.meshgrid(xs, xs, indexing="xy"), -1).reshape(-1, 2).astype(np.float32)
    gt_boxes = np.zeros((b, m, 4), np.float32)
    gt_boxes[0, 0] = [0, 0, 32, 32]
    gt_cls = np.zeros((b, m), np.int32)
    mask_gt = np.zeros((b, m), bool)
    mask_gt[0, 0] = True
    scores = np.full((b, a, nc), 0.5, np.float32)
    pd_boxes = np.tile(pts, (1, 1, 2))  # degenerate boxes at anchor points
    pd_boxes = np.concatenate([pts - 8, pts + 8], -1)[None]
    tgt_boxes, tgt_scores, fg, _ = task_aligned_assigner(
        jnp.asarray(scores), jnp.asarray(pd_boxes), jnp.asarray(pts),
        jnp.asarray(gt_cls), jnp.asarray(gt_boxes), jnp.asarray(mask_gt),
    )
    fg = np.asarray(fg)[0]
    inside = (pts[:, 0] < 32) & (pts[:, 1] < 32)
    assert fg.any()
    assert not fg[~inside].any()  # no fg anchors outside the gt box
    tb = np.asarray(tgt_boxes)[0][fg]
    np.testing.assert_allclose(tb, np.tile([0, 0, 32, 32], (fg.sum(), 1)))


def test_detection_loss_finite_and_positive():
    feats = _fake_feats()
    loss, metrics = detection_loss(feats, _fake_batch(), nc=80)
    assert np.isfinite(float(loss)) and float(loss) > 0
    for k in ("loss_box", "loss_cls", "loss_dfl"):
        assert np.isfinite(float(metrics[k]))
    assert int(metrics["num_fg"]) > 0


def test_detection_loss_no_gt_only_cls():
    feats = _fake_feats()
    batch = _fake_batch()
    batch["mask"] = jnp.zeros_like(batch["mask"])
    loss, metrics = detection_loss(feats, batch, nc=80)
    assert float(metrics["loss_box"]) == 0.0
    assert float(metrics["loss_dfl"]) == 0.0
    assert float(metrics["loss_cls"]) > 0  # background suppression remains


def test_loss_gradients_flow():
    feats = _fake_feats(b=1)
    batch = _fake_batch(b=1)

    def f(f0):
        loss, _ = detection_loss([f0, feats[1], feats[2]], batch, nc=80)
        return loss

    g = jax.grad(f)(feats[0])
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
