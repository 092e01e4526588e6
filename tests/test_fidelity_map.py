"""End-to-end fidelity measured in mAP units: torch pipeline vs JAX stack.

VERDICT r2 next-step 1c. For every task, ONE converted checkpoint runs
through two fully separate pipelines:

  (a) the production JAX path — device preprocess, forward, DFL decode,
      fixed-shape NMS, host coordinate mapping (core/predictor.Predictor);
  (b) an independent numpy pipeline over the torch reference forward
      (tests/torch_ref.py): numpy softmax-expectation DFL, anchor grid,
      sequential greedy NMS, written in this file with no imports from
      yolo_infer_tpu.ops.

Both detection sets are scored with the brute-force AP oracle
(core/ap_oracle) against the SAME ground truth. The sensitive variant plants
the torch pipeline's own high-confidence detections as GT: any drift in
conversion, forward numerics, decode, NMS or coordinate mapping then shows up
as a mAP drop at the strict IoU thresholds. Gate asserted here: |delta| <=
0.02 — 5x tighter than the BASELINE.md "mAP within 0.1 of reference" gate.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from golden_common import golden_state_dict
from torch_ref import TorchYOLO11

from yolo_infer_tpu.core.ap_oracle import oracle_map
from yolo_infer_tpu.core.predictor import Predictor
from yolo_infer_tpu.models import build_spec
from yolo_infer_tpu.models.convert import convert_state_dict, extract_state_dict
from yolo_infer_tpu.models.yolo11 import fold_model

NC = 4
IMGSZ = 128
N_IMAGES = 6
REG_MAX = 16
STRIDES = (8, 16, 32)


# ---------------------------------------------------------------------------
# independent numpy pipeline (no yolo_infer_tpu.ops imports)
# ---------------------------------------------------------------------------


def _np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x.astype(np.float64)))


def _np_decode(feats_nchw):
    """list of (1, 4*reg_max+nc, h, w) numpy -> (A, 4) xyxy px, (A, nc) scores."""
    boxes_all, scores_all = [], []
    for f, s in zip(feats_nchw, STRIDES):
        a = f[0].transpose(1, 2, 0)
        h, w, _ = a.shape
        flat = a.reshape(h * w, -1).astype(np.float64)
        logits = flat[:, : 4 * REG_MAX].reshape(-1, 4, REG_MAX)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        dist = (e / e.sum(-1, keepdims=True) @ np.arange(REG_MAX, dtype=np.float64))
        gx, gy = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
        ap = np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
        x1y1 = ap - dist[:, :2]
        x2y2 = ap + dist[:, 2:]
        boxes_all.append(np.concatenate([x1y1, x2y2], axis=-1) * s)
        scores_all.append(_np_sigmoid(flat[:, 4 * REG_MAX :]))
    return np.concatenate(boxes_all), np.concatenate(scores_all)


def _np_iou(a, b, eps=1e-7):
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
    ar_a = max(0.0, a[2] - a[0]) * max(0.0, a[3] - a[1])
    ar_b = max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1])
    return inter / (ar_a + ar_b - inter + eps)


def _np_nms_multilabel(boxes, scores, conf, iou_thres, max_det=300):
    """Sequential greedy class-aware multi-label NMS (the textbook loop)."""
    a, nc = scores.shape
    ai, ci = np.nonzero(scores > conf)
    order = np.argsort(-scores[ai, ci], kind="stable")
    kept = []  # (score, anchor, cls)
    for idx in order:
        i, c = int(ai[idx]), int(ci[idx])
        if all(c != kc or _np_iou(boxes[i], boxes[ki]) <= iou_thres for _, ki, kc in kept):
            kept.append((float(scores[i, c]), i, c))
            if len(kept) >= max_det:
                break
    return kept


def _np_probiou(a, b, eps=1e-7):
    """Scalar probIoU of two (cx, cy, w, h, r) boxes — paper formula."""
    def cov(bx):
        aa, bb = bx[2] ** 2 / 12.0, bx[3] ** 2 / 12.0
        c, s = np.cos(bx[4]), np.sin(bx[4])
        return aa * c * c + bb * s * s, aa * s * s + bb * c * c, (aa - bb) * c * s

    a1, b1, c1 = cov(a)
    a2, b2, c2 = cov(b)
    dx, dy = a[0] - b[0], a[1] - b[1]
    sa, sb, sc = a1 + a2, b1 + b2, c1 + c2
    denom = sa * sb - sc * sc + eps
    t1 = (sb * dx * dx + sa * dy * dy - 2 * sc * dx * dy) / denom * 0.25
    det1 = max(a1 * b1 - c1 * c1, eps)
    det2 = max(a2 * b2 - c2 * c2, eps)
    t3 = np.log(denom / (4 * np.sqrt(det1 * det2) + eps) + eps) * 0.5
    bd = min(max(t1 + t3, eps), 100.0)
    return 1.0 - np.sqrt(max(1.0 - np.exp(-bd), eps))


def _np_rotated_nms(rboxes, scores, conf, iou_thres, max_det=300):
    """Single-label greedy probIoU NMS (the production OBB semantics)."""
    best = scores.max(-1)
    cls = scores.argmax(-1)
    idx = np.nonzero(best > conf)[0]
    order = idx[np.argsort(-best[idx], kind="stable")]
    kept = []
    for i in order:
        if all(cls[i] != cls[k] or _np_probiou(rboxes[i], rboxes[k]) <= iou_thres for k in kept):
            kept.append(int(i))
            if len(kept) >= max_det:
                break
    return [(float(best[i]), i, int(cls[i])) for i in kept]


def _np_masks(proto_hwc, coefs, boxes_px, imgsz):
    """sigmoid(proto @ coef), crop at proto res, bilinear upsample, >0.5 —
    the ultralytics process_mask(upsample=True) order, in plain numpy."""
    import cv2

    hm, wm, nm = proto_hwc.shape
    logits = proto_hwc.reshape(-1, nm).astype(np.float64) @ np.asarray(coefs, np.float64).T
    m = _np_sigmoid(logits).T.reshape(-1, hm, wm)
    s = hm / imgsz
    ys = np.arange(hm)[None, :, None]
    xs = np.arange(wm)[None, None, :]
    b = np.asarray(boxes_px) * s
    keep = (xs >= b[:, 0, None, None]) & (xs < b[:, 2, None, None]) & (ys >= b[:, 1, None, None]) & (ys < b[:, 3, None, None])
    m = (m * keep).astype(np.float32)
    out = np.zeros((len(m), imgsz, imgsz), bool)
    for i in range(len(m)):
        out[i] = cv2.resize(m[i], (imgsz, imgsz), interpolation=cv2.INTER_LINEAR) > 0.5
    return out


def _np_kpts(kmaps_nchw, anchor_idx, kpt_shape):
    """Raw kpt maps + selected anchors -> (n, K, 3) decoded, plain numpy."""
    k, d = kpt_shape
    flats, aps, sts = [], [], []
    for f, s in zip(kmaps_nchw, STRIDES):
        a = f[0].transpose(1, 2, 0)
        h, w, _ = a.shape
        flats.append(a.reshape(h * w, -1))
        gx, gy = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
        aps.append(np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
        sts.append(np.full(h * w, float(s)))
    flat = np.concatenate(flats)
    ap = np.concatenate(aps)
    st = np.concatenate(sts)
    y = flat[anchor_idx].reshape(-1, k, d).astype(np.float64)
    xy = (y[..., :2] * 2.0 + (ap[anchor_idx, None, :] - 0.5)) * st[anchor_idx, None, None]
    conf = _np_sigmoid(y[..., 2:3])
    return np.concatenate([xy, conf], axis=-1).astype(np.float32)


def _np_angles(amaps_nchw, anchor_idx):
    flat = np.concatenate([f[0].transpose(1, 2, 0).reshape(-1, f.shape[1]) for f in amaps_nchw])
    return (_np_sigmoid(flat[anchor_idx, 0]) - 0.25) * np.pi


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def _build_pair(task):
    """Deterministic torch model + the converted JAX predictor."""
    spec = build_spec(task, "n", nc=NC)
    tmodel = TorchYOLO11(spec).eval()
    names, shapes = zip(*[(kk, tuple(v.shape)) for kk, v in tmodel.state_dict().items()])
    sd = golden_state_dict(names, shapes)
    if task == "segment":
        # The golden init gives the mask-coef head near-zero weights, so
        # mask logits land within ~0.003 of the 0.5 sigmoid threshold
        # everywhere — a regime where ANY sub-1e-3 numeric difference
        # (u8 mask quantization, bf16, resize order) flips cells at random
        # and mask mAP measures noise. Real checkpoints have O(1) logit
        # spread; re-randomize the final coef conv at unit scale so the
        # fidelity gate tests the pipeline, not threshold chatter.
        rng = np.random.default_rng(7)
        for kk in list(sd):
            if "cv4" in kk and kk.endswith((".2.weight", ".2.bias")) and "proto" not in kk:
                sd[kk] = rng.normal(0.0, 8.0, sd[kk].shape).astype(np.float32)
    tmodel.load_state_dict({kk: torch.from_numpy(v) for kk, v in sd.items()})
    params, state = convert_state_dict(sd, spec)
    predictor = Predictor(fold_model(params, state), spec, compute_dtype=jnp.float32, pre_topk=2048)
    return tmodel, predictor, spec


def _images(seed=3):
    rng = np.random.default_rng(seed)
    # smooth blobs, not white noise: gives spatially coherent detections
    imgs = []
    for _ in range(N_IMAGES):
        base = rng.uniform(0, 255, (IMGSZ // 8, IMGSZ // 8, 3))
        import cv2

        imgs.append(cv2.resize(base, (IMGSZ, IMGSZ), interpolation=cv2.INTER_CUBIC).clip(0, 255).astype(np.uint8))
    return imgs


def _torch_detect_pipeline(tmodel, imgs, conf, iou_thres, task="detect", kpt_shape=(17, 3)):
    """Numpy reference pipeline -> list of per-image prediction dicts."""
    out = []
    for img in imgs:
        x = torch.from_numpy((img.astype(np.float32) / 255.0).transpose(2, 0, 1)[None])
        with torch.no_grad():
            res = tmodel(x)
        feats, extras = res if isinstance(res, tuple) else (res, {})
        feats = [f.numpy() for f in feats]
        boxes, scores = _np_decode(feats)
        if task == "obb":
            angles = _np_angles([a.numpy() for a in extras["angle"]], np.arange(len(boxes)))
            # rotated decode: ltrb in the rotated frame (independent math)
            rb = np.zeros((len(boxes), 5), np.float32)
            # reconstruct per-anchor ltrb dist and grid from the axis decode:
            # boxes = (ap - lt, ap + rb) * stride -> recover in grid units
            aps, sts = [], []
            for f, s in zip(feats, STRIDES):
                h, w = f.shape[2], f.shape[3]
                gx, gy = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
                aps.append(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))
                sts.append(np.full(h * w, float(s)))
            ap = np.concatenate(aps)
            st = np.concatenate(sts)
            lt = ap - boxes[:, :2] / st[:, None]
            rbd = boxes[:, 2:] / st[:, None] - ap
            c, s_ = np.cos(angles), np.sin(angles)
            xf = (rbd[:, 0] - lt[:, 0]) / 2
            yf = (rbd[:, 1] - lt[:, 1]) / 2
            rb[:, 0] = (xf * c - yf * s_ + ap[:, 0]) * st
            rb[:, 1] = (xf * s_ + yf * c + ap[:, 1]) * st
            rb[:, 2] = (lt[:, 0] + rbd[:, 0]) * st
            rb[:, 3] = (lt[:, 1] + rbd[:, 1]) * st
            rb[:, 4] = angles
            kept = _np_rotated_nms(rb, scores, conf, iou_thres)
            out.append({
                "pred_scores": np.array([kv[0] for kv in kept], np.float32),
                "pred_cls": np.array([kv[2] for kv in kept], np.int64),
                "rboxes": rb[[kv[1] for kv in kept]] if kept else np.zeros((0, 5), np.float32),
            })
            continue
        kept = _np_nms_multilabel(boxes, scores, conf, iou_thres)
        sel = np.array([kv[1] for kv in kept], np.int64)
        rec = {
            "pred_boxes": boxes[sel].clip(0, IMGSZ).astype(np.float32) if len(sel) else np.zeros((0, 4), np.float32),
            "pred_scores": np.array([kv[0] for kv in kept], np.float32),
            "pred_cls": np.array([kv[2] for kv in kept], np.int64),
        }
        if task == "segment" and len(sel):
            proto = extras["proto"][0].numpy().transpose(1, 2, 0)
            mc = np.concatenate([m[0].numpy().transpose(1, 2, 0).reshape(-1, m.shape[1]) for m in extras["mc"]])
            rec["masks"] = _np_masks(proto, mc[sel], boxes[sel], IMGSZ)
        elif task == "segment":
            rec["masks"] = np.zeros((0, IMGSZ, IMGSZ), bool)
        if task == "pose":
            rec["kpts"] = _np_kpts([kmap.numpy() for kmap in extras["kpts"]], sel, kpt_shape) if len(sel) else np.zeros((0,) + kpt_shape, np.float32)
        out.append(rec)
    return out


def _jax_pipeline(predictor, imgs, conf, iou_thres, task):
    results = predictor.predict(imgs, conf=conf, iou=iou_thres, imgsz=IMGSZ, multi_label=task != "obb")
    out = []
    for r in results:
        rec = {
            "pred_boxes": r.boxes,
            "pred_scores": r.scores,
            "pred_cls": r.classes.astype(np.int64),
        }
        if task == "segment":
            rec["masks"] = (r.masks > 0.5) if r.masks is not None and len(r.boxes) else np.zeros((0, IMGSZ, IMGSZ), bool)
        if task == "pose":
            rec["kpts"] = r.keypoints if r.keypoints is not None else np.zeros((0, 17, 3), np.float32)
        if task == "obb":
            rec["rboxes"] = r.obb if r.obb is not None else np.zeros((0, 5), np.float32)
        out.append(rec)
    return out


def _plant_gt(torch_preds, key="pred_boxes", top=6):
    """GT := the torch pipeline's top detections (the sensitive variant)."""
    gts = []
    for p in torch_preds:
        n = min(top, len(p["pred_scores"]))
        g = {"gt_cls": p["pred_cls"][:n]}
        if key == "pred_boxes":
            g["gt_boxes"] = p["pred_boxes"][:n]
        else:
            g["gt_" + key] = p[key][:n]
        gts.append(g)
    return gts


def _score_boxes(preds, gts):
    images = [{**p, **g} for p, g in zip(preds, gts)]
    return oracle_map(images, protocol="ultralytics")


@pytest.mark.parametrize("task", ["detect", "segment", "pose", "obb"])
def test_fidelity_map_delta(task):
    tmodel, predictor, spec = _build_pair(task)
    imgs = _images()
    conf, iou_thres = 0.55, 0.5

    tp = _torch_detect_pipeline(tmodel, imgs, conf, iou_thres, task=task, kpt_shape=getattr(spec, "kpt_shape", (17, 3)))
    jp = _jax_pipeline(predictor, imgs, conf, iou_thres, task)

    if task == "obb":
        # probIoU similarity vs planted rotated GT (scored identically for both)
        from yolo_infer_tpu.ops.rotated import probiou_matrix

        gts = _plant_gt(tp, key="rboxes")
        def images_for(preds):
            ims = []
            for p, g in zip(preds, gts):
                sim = np.asarray(probiou_matrix(jnp.asarray(p["rboxes"].reshape(-1, 5)), jnp.asarray(g["gt_rboxes"].reshape(-1, 5)))) if len(p["pred_scores"]) and len(g["gt_cls"]) else np.zeros((len(p["pred_scores"]), len(g["gt_cls"])), np.float32)
                ims.append({"sim": sim, "pred_scores": p["pred_scores"], "pred_cls": p["pred_cls"], "gt_cls": g["gt_cls"]})
            return ims
        m_t = oracle_map(images_for(tp), protocol="ultralytics")
        m_j = oracle_map(images_for(jp), protocol="ultralytics")
    else:
        gts = _plant_gt(tp)
        m_t = _score_boxes(tp, gts)
        m_j = _score_boxes(jp, gts)

    assert m_t["map50"] > 0.6, f"planted-GT torch mAP50 unexpectedly low: {m_t}"
    for key in ("map", "map50", "map75"):
        assert abs(m_t[key] - m_j[key]) <= 0.02, (key, m_t[key], m_j[key])

    if task == "segment":
        from yolo_infer_tpu.core.metrics import mask_iou_matrix

        gt_masks = [p["masks"][: min(6, len(p["masks"]))] for p in tp]
        def mask_images(preds):
            ims = []
            for p, gm, g in zip(preds, gt_masks, _plant_gt(tp)):
                sim = mask_iou_matrix(p["masks"].astype(np.float32), gm.astype(np.float32))
                ims.append({"sim": sim, "pred_scores": p["pred_scores"], "pred_cls": p["pred_cls"], "gt_cls": g["gt_cls"][: len(gm)]})
            return ims
        # COCO greedy matching here, not ultralytics: the random-weight scene
        # yields duplicate near-identical detections, and ultralytics'
        # unique-match dedup quirk then drops a match based on exact-tie
        # ordering luck — torch vs torch survives (ties at IoU 1.0), any
        # sub-1e-3 numeric difference loses a TP at ALL thresholds. Greedy
        # per-pred matching scores identical scenes identically; mask
        # fidelity itself is still gated at IoU up to 0.95.
        mm_t = oracle_map(mask_images(tp), protocol="coco")
        mm_j = oracle_map(mask_images(jp), protocol="coco")
        assert mm_t["map50"] > 0.6, mm_t
        assert abs(mm_t["map50"] - mm_j["map50"]) <= 0.03, (mm_t, mm_j)
        assert abs(mm_t["map"] - mm_j["map"]) <= 0.03, (mm_t, mm_j)

    if task == "pose":
        from yolo_infer_tpu.core.metrics import oks_matrix

        gts_k = _plant_gt(tp, key="kpts")
        gts_b = _plant_gt(tp)
        def kpt_images(preds):
            ims = []
            for p, gk, gb in zip(preds, gts_k, gts_b):
                gt_kpts = gk["gt_kpts"].copy()
                gt_kpts[..., 2] = 1.0  # all visible
                areas = (gb["gt_boxes"][:, 2] - gb["gt_boxes"][:, 0]) * (gb["gt_boxes"][:, 3] - gb["gt_boxes"][:, 1])
                sim = oks_matrix(p["kpts"], gt_kpts, areas)
                ims.append({"sim": sim, "pred_scores": p["pred_scores"], "pred_cls": p["pred_cls"], "gt_cls": gk["gt_cls"]})
            return ims
        km_t = oracle_map(kpt_images(tp), protocol="ultralytics")
        km_j = oracle_map(kpt_images(jp), protocol="ultralytics")
        assert abs(km_t["map50"] - km_j["map50"]) <= 0.03, (km_t, km_j)


def test_fidelity_random_gt_detect():
    """Random (not planted) GT: both pipelines must score identically against
    boxes they were never derived from."""
    tmodel, predictor, _ = _build_pair("detect")
    imgs = _images(seed=9)
    rng = np.random.default_rng(11)
    gts = []
    for _ in imgs:
        xy = rng.uniform(0, IMGSZ * 0.6, (5, 2))
        wh = rng.uniform(15, IMGSZ * 0.4, (5, 2))
        gts.append({
            "gt_boxes": np.concatenate([xy, np.minimum(xy + wh, IMGSZ)], axis=1).astype(np.float32),
            "gt_cls": rng.integers(0, NC, 5),
        })
    conf, iou_thres = 0.5, 0.5
    tp = _torch_detect_pipeline(tmodel, imgs, conf, iou_thres)
    jp = _jax_pipeline(predictor, imgs, conf, iou_thres, "detect")
    m_t = _score_boxes(tp, gts)
    m_j = _score_boxes(jp, gts)
    for key in ("map", "map50", "map75"):
        assert abs(m_t[key] - m_j[key]) <= 0.02, (key, m_t[key], m_j[key])
