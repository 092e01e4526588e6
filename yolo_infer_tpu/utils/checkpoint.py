"""Checkpoint manager: native msgpack pytree checkpoints with resume semantics.

Reimplements the reference's CheckpointManager contract
(reference utils/checkpoint.py:18-312): full training state (params,
optimizer state, and the TrainState PRNG key — the JAX analog of the
torch/CUDA RNG streams the reference captures at checkpoint.py:88-92),
epoch/step/metrics/best tracking, latest-checkpoint discovery, keep-last-N
cleanup, and best-model-by-metric files. Resume is epoch-granular: the train
loader reseeds deterministically from (seed, epoch), so a resumed run
reproduces the exact batch sequence the uninterrupted run would have seen
(tested in tests/test_train.py). Storage is flax msgpack (no pickle,
host-portable) + a JSON sidecar for cheap inspection.
"""

from __future__ import annotations

import json
import logging
import re
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import jax
import numpy as np
from flax import serialization

logger = logging.getLogger(__name__)

_CKPT_RE = re.compile(r"checkpoint_epoch_(\d+)\.msgpack$")


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    """Save/load/rotate training checkpoints in `checkpoint_dir`."""

    def __init__(self, checkpoint_dir: Union[str, Path] = "checkpoints", max_checkpoints: int = 5):
        self.checkpoint_dir = Path(checkpoint_dir)
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        self.max_checkpoints = max_checkpoints

    # -- save -----------------------------------------------------------------

    def save_checkpoint(
        self,
        train_state: Dict[str, Any],
        epoch: int,
        step: Optional[int] = None,
        metrics: Optional[Dict[str, float]] = None,
        is_best: bool = False,
    ) -> Path:
        """train_state: pytree dict (params, opt_state, model_state, rng...)."""
        path = self.checkpoint_dir / f"checkpoint_epoch_{epoch:04d}.msgpack"
        # to_state_dict converts tuples/namedtuples (optax states) to dicts
        payload = {"train_state": _to_host(serialization.to_state_dict(train_state))}
        path.write_bytes(serialization.msgpack_serialize(payload))
        meta = {
            "epoch": epoch,
            "step": step,
            "metrics": metrics or {},
            "timestamp": time.time(),
            "is_best": is_best,
        }
        path.with_suffix(".json").write_text(json.dumps(meta, indent=2, default=float))
        if is_best:
            best = self.checkpoint_dir / "best.msgpack"
            best.write_bytes(path.read_bytes())
            best.with_suffix(".json").write_text(path.with_suffix(".json").read_text())
        self.cleanup_checkpoints()
        logger.info("saved checkpoint %s", path)
        return path

    def save_best_model(self, params: Any, metric_name: str, value: float) -> Path:
        path = self.checkpoint_dir / f"best_{metric_name}_{value:.4f}.msgpack"
        path.write_bytes(serialization.msgpack_serialize({"params": _to_host(params)}))
        return path

    # -- load -----------------------------------------------------------------

    def load_checkpoint(
        self,
        checkpoint_path: Optional[Union[str, Path]] = None,
        target: Optional[Dict[str, Any]] = None,
    ) -> Dict[str, Any]:
        """Load a checkpoint (latest if path omitted).

        With `target` (a matching pytree of the same structure) the restored
        arrays adopt the target's exact container types; without it you get
        plain nested dicts/lists of numpy arrays.
        """
        path = Path(checkpoint_path) if checkpoint_path else self.get_latest_checkpoint()
        if path is None or not Path(path).exists():
            raise FileNotFoundError(f"no checkpoint found at {checkpoint_path or self.checkpoint_dir}")
        raw = serialization.msgpack_restore(Path(path).read_bytes())
        state = raw["train_state"]
        if target is not None:
            state = serialization.from_state_dict(target, state)
        meta_path = Path(path).with_suffix(".json")
        meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
        return {"train_state": state, **meta}

    # -- discovery / rotation ---------------------------------------------------

    def list_checkpoints(self) -> List[Path]:
        return sorted(self.checkpoint_dir.glob("checkpoint_epoch_*.msgpack"))

    def get_latest_checkpoint(self) -> Optional[Path]:
        ckpts = self.list_checkpoints()
        if not ckpts:
            return None
        return max(ckpts, key=lambda p: int(_CKPT_RE.search(p.name).group(1)))

    def get_checkpoint_info(self, path: Union[str, Path]) -> Dict[str, Any]:
        meta_path = Path(path).with_suffix(".json")
        info: Dict[str, Any] = {"path": str(path), "size_bytes": Path(path).stat().st_size}
        if meta_path.exists():
            info.update(json.loads(meta_path.read_text()))
        return info

    def cleanup_checkpoints(self) -> None:
        ckpts = self.list_checkpoints()
        if len(ckpts) <= self.max_checkpoints:
            return
        by_epoch = sorted(ckpts, key=lambda p: int(_CKPT_RE.search(p.name).group(1)))
        for old in by_epoch[: len(by_epoch) - self.max_checkpoints]:
            old.unlink(missing_ok=True)
            old.with_suffix(".json").unlink(missing_ok=True)
            logger.info("removed old checkpoint %s", old)


def save_training_state(path: Union[str, Path], train_state: Dict[str, Any], **meta) -> None:
    """Module-level convenience (reference utils/checkpoint.py:333-404)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(serialization.msgpack_serialize({"train_state": _to_host(train_state), "meta": meta}))


def load_training_state(path: Union[str, Path], target: Optional[Any] = None) -> Dict[str, Any]:
    raw = serialization.msgpack_restore(Path(path).read_bytes())
    if target is not None:
        raw["train_state"] = serialization.from_state_dict(target, raw["train_state"])
    return raw
