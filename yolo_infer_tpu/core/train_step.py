"""The jitted training step: forward+loss+backward+update as one XLA program.

TPU-native redesign of the reference's per-batch training loop
(reference core/robust_trainer.py:381-456): instead of eager
autocast/GradScaler/DDP (robust_trainer.py:399-410), one jit'd function does
bf16 forward, fp32 loss/grads, SGD+momentum update, EMA, and — the TPU
version of the reference's per-batch try/except "robust" feature
(robust_trainer.py:448-456) — a non-finite-loss guard that drops the update
and counts the skipped step in-graph (SURVEY.md §5 "failure detection":
JIT'd steps can't catch Python exceptions, so batch sanitation happens
host-side and numeric blowups are skipped in-graph via `jnp.where`).

Data parallelism: params/batch arrive sharded over a ('data','model') mesh
(parallel.mesh); XLA GSPMD inserts the gradient psum over ICI — there is no
explicit collective in this file, which is exactly the point.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from yolo_infer_tpu.core.losses import DEFAULT_HYP, classification_loss, detection_loss
from yolo_infer_tpu.models.spec import ModelSpec
from yolo_infer_tpu.models.yolo11 import build_model, forward


@dataclasses.dataclass
class TrainState:
    """Pytree training state + static (spec, tx) handles."""

    params: Any
    bn_state: Any
    opt_state: Any
    ema_params: Any
    step: Any  # int32 scalar
    skipped: Any  # int32 scalar: updates dropped by the finite guard
    spec: ModelSpec
    tx: optax.GradientTransformation
    rng: Any = None  # PRNG key, advanced per step; checkpointed (the JAX
    # analog of the torch/CUDA RNG streams the reference saves,
    # reference utils/checkpoint.py:88-92)

    def tree(self) -> Dict[str, Any]:
        return {
            "params": self.params,
            "bn_state": self.bn_state,
            "opt_state": self.opt_state,
            "ema_params": self.ema_params,
            "step": self.step,
            "skipped": self.skipped,
            "rng": self.rng if self.rng is not None else jax.random.PRNGKey(0),
        }

    def with_tree(self, tree: Dict[str, Any]) -> "TrainState":
        return dataclasses.replace(self, **tree)

    def replace_params(self, params) -> "TrainState":
        return dataclasses.replace(self, params=params)


def _is_bias_leaf(path) -> bool:
    """ultralytics optimizer group g2: conv biases ('b') and BN betas.

    The reference's warmup treats the bias group specially
    (robust_trainer.py:386-396: bias lr ramps DOWN from warmup_bias_lr)."""
    leaf_key = getattr(path[-1], "key", None)
    return leaf_key in ("b", "beta")


def yolo_sgd(
    base_schedule,  # step -> target lr (lr0 scaled by the decay schedule)
    *,
    warmup_steps: int,
    momentum: float = 0.937,
    warmup_momentum: float = 0.8,
    warmup_bias_lr: float = 0.1,
    nesterov: bool = True,
) -> optax.GradientTransformation:
    """torch-SGD semantics with the reference's per-group warmup.

    Mirrors the ultralytics warmup loop the reference re-implements
    (reference core/robust_trainer.py:386-396) exactly:
      * bias group lr:   np.interp(ni, [0, nw], [warmup_bias_lr, lr(t)])
      * other groups lr: np.interp(ni, [0, nw], [0.0, lr(t)])
      * momentum:        np.interp(ni, [0, nw], [warmup_momentum, momentum])
    then plain SGD+nesterov (buf = m*buf + g; d = g + m*buf) after step nw.
    Momentum varies per step, so the buffer update is hand-rolled rather than
    optax.trace (whose decay is fixed at init).
    """
    nw = float(max(warmup_steps, 0))

    def init(params):
        return {
            "count": jnp.zeros([], jnp.int32),
            "mom": jax.tree_util.tree_map(jnp.zeros_like, params),
        }

    def update(updates, state, params=None):
        del params
        t = state["count"].astype(jnp.float32)  # ni: 0-based batch index
        if nw > 0:
            frac = jnp.clip(t / nw, 0.0, 1.0)
            in_warm = t <= nw
            mom_t = jnp.where(in_warm, warmup_momentum + (momentum - warmup_momentum) * frac, momentum)
            base = base_schedule(state["count"])
            lr_other = jnp.where(in_warm, frac * base, base)
            lr_bias = jnp.where(in_warm, warmup_bias_lr + frac * (base - warmup_bias_lr), base)
        else:
            mom_t = momentum
            lr_other = lr_bias = base_schedule(state["count"])
        new_mom = jax.tree_util.tree_map(lambda m, g: mom_t * m + g, state["mom"], updates)
        step_dir = (
            jax.tree_util.tree_map(lambda g, m: g + mom_t * m, updates, new_mom)
            if nesterov
            else new_mom
        )
        out = jax.tree_util.tree_map_with_path(
            lambda path, d: -(lr_bias if _is_bias_leaf(path) else lr_other) * d, step_dir
        )
        return out, {"count": state["count"] + 1, "mom": new_mom}

    return optax.GradientTransformation(init, update)


def make_optimizer(
    lr: float = 0.01,
    *,
    lrf: float = 0.01,
    total_steps: int = 10_000,
    warmup_steps: int = 1000,
    momentum: float = 0.937,
    weight_decay: float = 5e-4,
    cos_lr: bool = True,
    warmup_momentum: float = 0.8,
    warmup_bias_lr: float = 0.1,
    freeze=None,  # Optional[Callable[[top-level layer key], bool]]
) -> optax.GradientTransformation:
    """SGD + nesterov momentum with the reference's exact warmup, then
    cosine/linear decay to lr*lrf.

    Mirrors the training capability spec (reference core/trainer.py:589-637:
    lr0/lrf/momentum/weight_decay/warmup defaults) including per-group warmup
    (bias lr ramp from warmup_bias_lr, momentum 0.8->0.937 — reference
    robust_trainer.py:386-396). `freeze` is the functional analog of
    requires_grad=False (reference trainer.py:383-404): updates for frozen
    top-level layers are zeroed inside the optimizer. warmup_steps <= 0
    disables warmup entirely (the reference gates on warmup_epochs > 0).
    """
    warmup_steps = min(max(warmup_steps, 0), max(total_steps - 1, 1))
    # the schedule x-axis spans ALL steps including the warmup window —
    # ultralytics' lf(epoch) advances during warmup (its scheduler steps
    # every epoch from epoch 0), so the warmup interp target is the DECAYED
    # value at the current step, not a frozen lr0 (step-granular here vs the
    # reference's epoch-granular lf; reference robust_trainer.py:386-396)
    if cos_lr:
        decay = optax.cosine_decay_schedule(lr, max(total_steps, 1), alpha=lrf)
    else:
        decay = optax.linear_schedule(lr, lr * lrf, max(total_steps, 1))

    def target_lr(count):
        return decay(count)

    def decay_mask(params):
        # weight decay on conv/dense kernels only (not BN scale/bias/biases),
        # i.e. ultralytics group g0 (reference trainer groups)
        return jax.tree_util.tree_map_with_path(
            lambda path, x: any(getattr(k, "key", None) == "w" for k in path) and x.ndim > 1, params
        )

    chain = [
        optax.clip_by_global_norm(10.0),  # YOLO-standard grad clipping
        optax.add_decayed_weights(weight_decay, mask=decay_mask),
        yolo_sgd(
            target_lr,
            warmup_steps=warmup_steps,
            momentum=momentum,
            warmup_momentum=warmup_momentum,
            warmup_bias_lr=warmup_bias_lr,
        ),
    ]
    if freeze is not None:

        def freeze_mask(params):
            return {k: jax.tree_util.tree_map(lambda _: bool(freeze(k)), v) for k, v in params.items()}

        chain.append(optax.masked(optax.set_to_zero(), freeze_mask))
    return optax.chain(*chain)


def init_train_state(
    rng: jax.Array,
    task: str = "detect",
    size: str = "n",
    nc: int = 80,
    imgsz: int = 640,
    lr: float = 0.01,
    total_steps: int = 10_000,
    warmup_steps: int = 1000,
    weight_decay: float = 5e-4,
    cos_lr: bool = True,
    **model_kw,
) -> TrainState:
    params, bn_state, spec = build_model(rng, task, size, nc, **model_kw)
    tx = make_optimizer(lr, total_steps=total_steps, warmup_steps=warmup_steps, weight_decay=weight_decay, cos_lr=cos_lr)
    return TrainState(
        params=params,
        bn_state=bn_state,
        opt_state=tx.init(params),
        # distinct buffers: params and ema are both donated by the train step
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        step=jnp.int32(0),
        skipped=jnp.int32(0),
        spec=spec,
        tx=tx,
        rng=jax.random.fold_in(rng, 0xA5),
    )


def make_train_step(
    spec: ModelSpec,
    tx: optax.GradientTransformation,
    *,
    hyp: Dict[str, float] = DEFAULT_HYP,
    mesh: Any = None,  # informational; shardings ride on the input arrays
    compute_dtype=jnp.bfloat16,
    ema_decay: float = 0.9999,
    ema_ramp: float = 2000.0,
    qat: bool = False,
    param_mask: Any = None,
    distill: Optional[Dict[str, Any]] = None,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted step. Batch dict (detect):
    images (B,H,W,3) f32 [0,1] | boxes (B,M,4) xyxy px | classes (B,M) | mask (B,M).
    Classify: images, labels (B,).
    With qat=True the forward fake-quantizes weights/activations (STE),
    so the trained weights survive int8 conversion (nn.quantize).

    param_mask: optional {0,1} pytree (params structure) re-applied to
    params AND ema after every update — in-graph pruning-mask enforcement
    (optimization/pruning.py): masked weights cannot regrow through
    momentum or weight decay.

    distill: optional knowledge-distillation spec
    {"params": teacher deploy params (fused), "spec": teacher ModelSpec,
     "temperature": T, "alpha": a} — the teacher runs frozen inside the same
    jitted step (its params are closed-over device constants, replicated
    under GSPMD) and the loss becomes a*soft + (1-a)*hard
    (optimization/distillation.py; reference declares alpha=0.7 / T=4.0,
    reference optimization/base.py:303-304).
    """

    def _fwd(params, bn_state, images):
        if qat:
            from yolo_infer_tpu.nn.quantize import QuantContext, quant_context

            with quant_context(QuantContext("fake")):
                return forward(params, bn_state, spec, images, training=True, compute_dtype=compute_dtype)
        return forward(params, bn_state, spec, images, training=True, compute_dtype=compute_dtype)

    def loss_fn(params, bn_state, batch):
        images = batch["images"]
        if images.dtype == jnp.uint8:  # loaders ship uint8; normalize in-graph
            images = images.astype(jnp.float32) * (1.0 / 255.0)
        out, new_bn = _fwd(params, bn_state, images)
        kw = dict(nc=spec.nc, reg_max=spec.reg_max, strides=spec.strides, hyp=hyp)
        if spec.task == "classify":
            loss, metrics = classification_loss(out["logits"], batch["labels"])
        elif spec.task == "segment" and "masks" in batch:
            from yolo_infer_tpu.core.losses import segmentation_loss

            loss, metrics = segmentation_loss(out, batch, **kw)
        elif spec.task == "pose" and "kpts" in batch:
            from yolo_infer_tpu.core.losses import pose_loss

            loss, metrics = pose_loss(out, batch, **kw)
        elif spec.task == "obb" and batch["boxes"].shape[-1] == 5:
            from yolo_infer_tpu.core.losses import obb_loss

            loss, metrics = obb_loss(out, batch, **kw)
        else:
            loss, metrics = detection_loss(out["feats"], batch, **kw)
        if distill is not None:
            t_out, _ = forward(
                distill["params"], None, distill["spec"], images,
                training=False, compute_dtype=compute_dtype,
            )
            t_out = jax.lax.stop_gradient(t_out)
            temperature = float(distill.get("temperature", 4.0))
            alpha = float(distill.get("alpha", 0.7))
            if spec.task == "classify":
                from yolo_infer_tpu.core.losses import distill_classify_loss

                soft = distill_classify_loss(out["logits"], t_out["logits"], temperature)
                kd_metrics = {"loss_kd": soft}
            else:
                from yolo_infer_tpu.core.losses import distill_detect_loss

                # hard task losses are scaled by batch size; scale the soft
                # term identically so alpha means the same at any batch
                soft, kd = distill_detect_loss(
                    out["feats"], t_out["feats"], nc=spec.nc, reg_max=spec.reg_max,
                    temperature=temperature,
                )
                soft = soft * images.shape[0]
                kd_metrics = {"loss_kd": soft, **kd}
            loss = (1.0 - alpha) * loss + alpha * soft
            metrics = {**metrics, **kd_metrics, "loss": loss}
        return loss, (new_bn, metrics)

    @partial(jax.jit, donate_argnums=(0,))
    def _step(tree, batch):
        (loss, (new_bn, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            tree["params"], tree["bn_state"], batch
        )
        # guard on GRADIENTS too: a step can have a finite loss but inf/NaN
        # grads (bf16 backward overflow) — updating from those poisons the
        # params one step before the loss-only check would catch it
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(loss) & jnp.isfinite(gnorm)

        updates, new_opt = tx.update(grads, tree["opt_state"], tree["params"])
        new_params = optax.apply_updates(tree["params"], updates)

        def sel(new, old):
            return jax.tree_util.tree_map(lambda n, o: jnp.where(finite, n, o), new, old)

        new_params = sel(new_params, tree["params"])
        new_opt = sel(new_opt, tree["opt_state"])
        new_bn = sel(new_bn, tree["bn_state"])
        if param_mask is not None:  # pruning: pinned zeros survive the update
            new_params = jax.tree_util.tree_map(
                lambda p, m: p * jnp.asarray(m, p.dtype), new_params, param_mask
            )

        step = tree["step"] + 1
        d = ema_decay * (1.0 - jnp.exp(-step.astype(jnp.float32) / ema_ramp))
        new_ema = jax.tree_util.tree_map(
            lambda e, p: jnp.where(finite, e * d + p.astype(e.dtype) * (1.0 - d), e),
            tree["ema_params"],
            new_params,
        )
        if param_mask is not None:
            new_ema = jax.tree_util.tree_map(
                lambda e, m: e * jnp.asarray(m, e.dtype), new_ema, param_mask
            )
        new_tree = {
            "params": new_params,
            "bn_state": new_bn,
            "opt_state": new_opt,
            "ema_params": new_ema,
            "step": step,
            "skipped": tree["skipped"] + jnp.where(finite, 0, 1).astype(jnp.int32),
            # advance the key every step so any in-graph stochastic op (QAT
            # stochastic rounding, dropout) is reproducible across resume
            "rng": jax.random.split(tree["rng"], 1)[0],
        }
        metrics = dict(metrics)
        metrics["step_skipped"] = (~finite).astype(jnp.int32)
        return new_tree, metrics

    def step_fn(ts: TrainState, batch: Dict[str, jnp.ndarray]):
        new_tree, metrics = _step(ts.tree(), batch)
        return ts.with_tree(new_tree), metrics

    return step_fn
