"""Pruning: magnitude / unstructured / structured / gradual — implemented.

The reference only *declares* this capability (reference optimization/base.py
:264-288: a `PruningOptimizer` ABC with methods
('magnitude','structured','unstructured','gradual') and a `sparsity` knob,
abstract `optimize`). This build implements all four methods TPU-natively.

Design notes (why masks, not surgery):
  * XLA compiles dense convolutions with static shapes; removing channels
    dynamically would force a recompile per sparsity level and unstructured
    sparsity cannot be exploited by the MXU at all. Pruned coordinates are
    therefore ZEROED under a persistent mask — shapes stay static, the
    compiled program is unchanged, and the win is model size (zeros compress;
    see `save_optimized_model` + msgpack/zip) and downstream
    sparsity-aware tooling, exactly the trade the torch eager pruning the
    reference points at (`torch.nn.utils.prune`) makes with its weight masks.
  * Structured pruning zeroes whole OUTPUT channels — conv kernel column
    w[..., c] plus that channel's BN affine (gamma[c], beta[c]) — so the
    channel's post-activation output is exactly SiLU(0) = 0 and the network
    behaves as if the channel were removed. A later surgery pass could then
    physically compact channels; kept out of scope because YOLO11's
    concat/CSP topology ties channel counts across layers.
  * During fine-tuning the mask is enforced IN-GRAPH every step
    (core/train_step.py `param_mask`): pruned weights cannot regrow through
    SGD momentum or weight decay.

Prunable surface: on training-form (unfused) trees, conv+BN blocks — params
dicts carrying both 'w' and 'gamma'. On FUSED deploy trees every conv is
{'w','b'}, so prunability is structural instead (_iter_prunable): the
detect/segment/pose/obb prediction convs (the last conv of each head branch)
and the classify 'linear' are excluded, because zeroing their output
channels deletes output classes, not capacity. Fused models are prune-only —
fine-tuning requires the unfused checkpoint and fails fast with a clear
error.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolo_infer_tpu.optimization.base import BaseOptimizer, OptimizationRegistry

logger = logging.getLogger(__name__)

METHODS = ("magnitude", "structured", "unstructured", "gradual")


# --------------------------------------------------------------------- masks


def _is_conv(d: Any) -> bool:
    return isinstance(d, dict) and "w" in d


def _iter_prunable(params: Any, masks: Any = None, fused: bool = False):
    """Yield prunable conv dicts, paired with the parallel mask dict when
    `masks` is given (else paired with None).

    Unfused trees: prunable = conv+BN dicts ({'w','gamma'}); head prediction
    convs carry no 'gamma' and fall out naturally. Fused trees: EVERY conv is
    {'w','b'}, so prunability is structural — the final conv of a head branch
    (a list of conv dicts: detect/segment/pose/obb cv2/cv3/cv4) and the
    classify 'linear' are excluded, because zeroing them deletes output
    classes/boxes, not capacity. int8 trees ('w_q') are never prunable.
    """

    def walk(p, m, skip):
        if isinstance(p, dict):
            if _is_conv(p):
                ok = (not skip and "b" in p) if fused else ("gamma" in p)
                if ok:
                    yield (p, m)
                return
            for k in p:
                yield from walk(p[k], m[k] if m is not None else None, skip or k == "linear")
        elif isinstance(p, (list, tuple)):
            is_branch = len(p) > 0 and all(_is_conv(v) for v in p)
            for i, v in enumerate(p):
                yield from walk(v, m[i] if m is not None else None,
                                skip or (is_branch and i == len(p) - 1))

    yield from walk(params, masks, False)


def _walk_prunable(params: Any, fused: bool = False):
    """Yield every prunable conv dict (see _iter_prunable)."""
    for conv, _ in _iter_prunable(params, None, fused):
        yield conv


def _ones_like_tree(params: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.ones(x.shape, np.float32), params)


def _exact_k_zero_mask(flat_mags: np.ndarray, k: int) -> np.ndarray:
    """Boolean zero-mask selecting EXACTLY k smallest-magnitude entries.

    A >=-threshold comparison keeps every weight tied with the k-th smallest,
    so achieved sparsity lands below target on tied values (degenerate
    all-equal layers would not prune at all) — argpartition breaks ties
    arbitrarily but hits k exactly (ADVICE r3)."""
    zero = np.zeros(flat_mags.size, bool)
    if k >= flat_mags.size:
        zero[:] = True
    elif k > 0:
        zero[np.argpartition(flat_mags, k - 1)[:k]] = True
    return zero


def magnitude_masks(params: Any, sparsity: float, scope: str = "global", fused: bool = False) -> Any:
    """Weight-level masks zeroing the smallest-|w| fraction.

    scope='global' ranks magnitudes across ALL prunable convs (one pool —
    the 'magnitude' method); scope='layer' prunes each conv to `sparsity`
    independently (the 'unstructured' method). Exactly floor(sparsity·n)
    weights are zeroed per pool (ties broken arbitrarily). Returns a float32
    {0,1} pytree with the SAME structure as `params` (non-prunable leaves get
    all-ones). `fused=True` prunes {'w','b'} deploy trees (prediction convs
    structurally excluded — see _iter_prunable).
    """
    sparsity = float(np.clip(sparsity, 0.0, 1.0))
    masks = _ones_like_tree(params)
    pairs = list(_iter_prunable(params, masks, fused))
    if not pairs or sparsity == 0.0:
        return masks
    mags = [np.abs(np.asarray(c["w"], np.float32)).reshape(-1) for c, _ in pairs]

    if scope == "global":
        flat = np.concatenate(mags)
        zero = _exact_k_zero_mask(flat, int(sparsity * flat.size))
        off = 0
        for (conv, m), w in zip(pairs, mags):
            z = zero[off: off + w.size]
            off += w.size
            m["w"] = (~z).astype(np.float32).reshape(np.asarray(conv["w"]).shape)
    else:  # per-layer
        for (conv, m), w in zip(pairs, mags):
            zero = _exact_k_zero_mask(w, int(sparsity * w.size))
            m["w"] = (~zero).astype(np.float32).reshape(np.asarray(conv["w"]).shape)
    return masks


def channel_masks(params: Any, sparsity: float, fused: bool = False) -> Any:
    """Structured masks zeroing whole output channels (lowest L2 norm first).

    Per prunable conv, channels are ranked by the L2 norm of w[..., c]; the
    lowest `sparsity` fraction is zeroed in w AND in the channel's affine
    tail — BN gamma/beta on unfused trees, the folded bias on fused trees —
    so the channel's output is identically zero after SiLU.
    At least one channel per conv always survives.
    """
    sparsity = float(np.clip(sparsity, 0.0, 1.0))
    masks = _ones_like_tree(params)
    if sparsity == 0.0:
        return masks

    for conv, m in _iter_prunable(params, masks, fused):
        w = np.asarray(conv["w"], np.float32)
        c_out = w.shape[-1]
        norms = np.sqrt((w.reshape(-1, c_out) ** 2).sum(axis=0))
        n_prune = min(int(sparsity * c_out), c_out - 1)
        if n_prune <= 0:
            continue
        dead = np.argsort(norms)[:n_prune]
        ch = np.ones(c_out, np.float32)
        ch[dead] = 0.0
        m["w"] = np.broadcast_to(ch, w.shape).copy()
        for key in ("gamma", "beta", "b"):
            if key in conv:
                m[key] = ch.copy()
    return masks


def apply_masks(params: Any, masks: Any) -> Any:
    """params * masks, preserving each leaf's dtype."""
    return jax.tree_util.tree_map(lambda p, m: (p * jnp.asarray(m, p.dtype)).astype(p.dtype), params, masks)


def combine_masks(a: Any, b: Any) -> Any:
    return jax.tree_util.tree_map(lambda x, y: x * y, a, b)


def sparsity_report(params: Any, fused: bool = False) -> Dict[str, float]:
    """Achieved sparsity over the prunable surface (and overall zeros)."""
    prunable_total = prunable_zero = 0
    for conv in _walk_prunable(params, fused):
        w = np.asarray(conv["w"])
        prunable_total += w.size
        prunable_zero += int((w == 0).sum())
    all_leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(params)]
    total = sum(x.size for x in all_leaves)
    zeros = sum(int((x == 0).sum()) for x in all_leaves)
    return {
        "prunable_params": prunable_total,
        "prunable_zeros": prunable_zero,
        "prunable_sparsity": prunable_zero / max(prunable_total, 1),
        "total_params": total,
        "total_zeros": zeros,
        "total_sparsity": zeros / max(total, 1),
    }


def gradual_sparsity_schedule(si: float, sf: float, t: float) -> float:
    """Zhu & Gupta cubic ramp: s(t) = sf + (si - sf) * (1 - t)^3, t in [0,1]."""
    t = float(np.clip(t, 0.0, 1.0))
    return sf + (si - sf) * (1.0 - t) ** 3


# ----------------------------------------------------------------- optimizer


class PruningOptimizer(BaseOptimizer):
    """Mask-based pruning over the YOLO11 conv stack.

    Implements the capability the reference declares abstract
    (reference optimization/base.py:264-288). Config keys:
      method            magnitude | unstructured | structured | gradual
      sparsity          target fraction of prunable weights zeroed (0.5)
      initial_sparsity  gradual start point (0.0)
      prune_rounds      gradual: number of prune→fine-tune rounds (4)
      fine_tune_lr      lr for post-prune fine-tuning (1e-3)

    `optimize(data=None, epochs=...)`:
      * no data  — one-shot prune; returns the pruned model.
      * data     — prune then fine-tune with the mask enforced in-graph
                   every step (weights cannot regrow); method 'gradual'
                   ramps sparsity over `prune_rounds` rounds of
                   `epochs // prune_rounds` epochs each (cubic schedule).

    method='structured' with `physical: true` runs channel SURGERY instead
    of masking (optimization/surgery.py): low-importance internal channel
    groups are physically removed, so the compiled model is genuinely
    smaller and faster — no masks, and fine-tuning is plain training on the
    slimmed tree. `sparsity` then means the fraction of each internal
    group's channels removed (overall param reduction is reported).
    """

    METHODS = METHODS

    def __init__(self, model: Any, config: Optional[Dict[str, Any]] = None):
        super().__init__(model, config)
        self.method = self.config.get("method", "magnitude")
        if self.method not in METHODS:
            raise ValueError(f"method {self.method!r} not in {METHODS}")
        self.sparsity = float(self.config.get("sparsity", 0.5))
        self.initial_sparsity = float(self.config.get("initial_sparsity", 0.0))
        self.prune_rounds = int(self.config.get("prune_rounds", 4))
        self.fine_tune_lr = float(self.config.get("fine_tune_lr", 1e-3))
        self.physical = bool(self.config.get("physical", False))
        self.align = int(self.config.get("align", 8))
        if self.physical and self.method != "structured":
            raise ValueError("physical surgery requires method='structured'")
        self.masks: Any = None

    # -- internals -------------------------------------------------------

    def _masks_at(self, params: Any, sparsity: float, fused: bool = False) -> Any:
        if self.method == "structured":
            return channel_masks(params, sparsity, fused=fused)
        scope = "layer" if self.method == "unstructured" else "global"
        return magnitude_masks(params, sparsity, scope=scope, fused=fused)

    def _student_copy(self):
        """Trainable copy of self.model (original left untouched for
        BaseOptimizer.compare_models)."""
        from yolo_infer_tpu.core.model import YOLO11Model

        m = self.model
        if m.state is None:
            raise ValueError(
                "fine-tuning a pruned model needs training-form (unfused) params; "
                f"{m.model_path!r} was loaded fused — re-load the unfused checkpoint"
            )
        cp = jax.tree_util.tree_map(jnp.copy, m.params)
        st = jax.tree_util.tree_map(jnp.copy, m.state)
        return YOLO11Model.from_params(
            cp, task=m.task, size=m.size, nc=m.nc, names=m.names, fused=False, state=st,
            compute_dtype=m.compute_dtype, model_path=f"{m.model_path}-pruned",
        )

    def _fine_tune(self, student, masks, data: str, epochs: int, **train_kw) -> Dict[str, Any]:
        from yolo_infer_tpu.core.trainer import TrainingConfig, YOLO11Trainer

        cfg = TrainingConfig(
            data=data, epochs=epochs, lr0=train_kw.pop("lr0", self.fine_tune_lr),
            warmup_epochs=train_kw.pop("warmup_epochs", 0.0), mosaic=train_kw.pop("mosaic", 0.0),
            **train_kw,
        )
        trainer = YOLO11Trainer(model=student, config=cfg)
        trainer.param_mask = masks  # in-graph enforcement (core/train_step.py)
        return trainer.train()

    # -- contract ----------------------------------------------------------

    def _optimize_physical(self, data: Optional[str], epochs: int, **train_kw) -> Any:
        from yolo_infer_tpu.core.model import YOLO11Model
        from yolo_infer_tpu.optimization.surgery import slim_model

        m = self.model
        src_params = m.params if m.state is not None else m.deploy_params
        new_p, new_s, plan, rep = slim_model(
            src_params, m.state, m.spec, keep_frac=1.0 - self.sparsity, align=self.align
        )
        student = YOLO11Model.from_params(
            new_p, task=m.task, size=m.size, nc=m.nc, names=m.names,
            fused=new_s is None, state=new_s, compute_dtype=m.compute_dtype,
            model_path=f"{m.model_path}-slim",
        )
        fine_tune_info = None
        if data:
            if new_s is None:
                raise ValueError("fine-tuning a slimmed model needs training-form (unfused) params")
            # plain fine-tune: the slimmed tree needs no masks
            out = self._fine_tune(student, None, data, epochs, **train_kw)
            fine_tune_info = {k: v for k, v in out.items()
                              if k in ("status", "epochs_completed", "best_fitness")}
        self.optimized_model = student
        self.optimization_info = {
            "method": "structured-physical",
            "target_sparsity": self.sparsity,
            "surgery": rep,
            "fine_tune": fine_tune_info,
        }
        return student

    def optimize(self, data: Optional[str] = None, epochs: int = 4, **train_kw) -> Any:
        if self.physical:
            return self._optimize_physical(data, epochs, **train_kw)
        model_fused = self.model.state is None
        t_params = self.model.params if not model_fused else self.model.deploy_params
        before = sparsity_report(t_params, fused=model_fused)

        if self.method == "gradual" and data:
            student = self._student_copy()
            rounds = max(self.prune_rounds, 1)
            per_round = max(epochs // rounds, 1)
            history = []
            for r in range(rounds):
                s_t = gradual_sparsity_schedule(self.initial_sparsity, self.sparsity, (r + 1) / rounds)
                self.masks = self._masks_at(student.params, s_t)
                student.params = apply_masks(student.params, self.masks)
                student.invalidate()
                out = self._fine_tune(student, self.masks, data, per_round, exist_ok=True, **train_kw)
                history.append({"round": r, "sparsity": s_t, "epochs": per_round,
                                "loss": (out["history"][-1].get("loss") if out["history"] else None)})
                logger.info("gradual prune round %d/%d: sparsity %.3f", r + 1, rounds, s_t)
            fine_tune_info: Any = history
        else:
            if not model_fused:
                student = self._student_copy()
            else:  # fused model: prune-only on the deploy tree
                if data:
                    # fail HERE, not deep inside the trainer (ADVICE r3):
                    # fine-tuning needs BN state, which a fused tree has lost
                    raise ValueError(
                        "fine-tuning a pruned model needs training-form (unfused) params; "
                        f"{self.model.model_path!r} was loaded fused — re-load the unfused "
                        "checkpoint, or call optimize() without data for prune-only"
                    )
                from yolo_infer_tpu.core.model import YOLO11Model

                m = self.model
                student = YOLO11Model.from_params(
                    jax.tree_util.tree_map(jnp.copy, m.deploy_params), task=m.task, size=m.size,
                    nc=m.nc, names=m.names, fused=True, compute_dtype=m.compute_dtype,
                    model_path=f"{m.model_path}-pruned",
                )
            self.masks = self._masks_at(student.params, self.sparsity, fused=model_fused)
            student.params = apply_masks(student.params, self.masks)
            student.invalidate()
            fine_tune_info = None
            if data:
                fine_tune_info = {k: v for k, v in self._fine_tune(student, self.masks, data, epochs, **train_kw).items()
                                  if k in ("status", "epochs_completed", "best_fitness")}

        after = sparsity_report(student.params if student.state is not None else student.deploy_params,
                                fused=student.state is None)
        self.optimized_model = student
        self.optimization_info = {
            "method": self.method,
            "target_sparsity": self.sparsity,
            "before": before,
            "after": after,
            "fine_tune": fine_tune_info,
        }
        return student


OptimizationRegistry.register("prune", PruningOptimizer)


def create_pruner(model: Any, config: Optional[Dict[str, Any]] = None) -> PruningOptimizer:
    return PruningOptimizer(model, config)
