"""Multi-host coordination helpers (single-controller JAX flavor).

The reference's distributed surface is rank gates (`RANK in {-1, 0}`) and
`dist.broadcast_object_list` stop-flags (reference core/robust_trainer.py:
375,420-425,493-496). Under single-controller JAX most of this disappears —
one Python program drives all chips — but multi-host (multi-process) runs
still need host-0 gating for logging/checkpointing and agreement on scalar
decisions, provided here over jax collectives (SURVEY.md §2c).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    """The host-0 gate (reference's `RANK in {-1, 0}` checks)."""
    return jax.process_index() == 0


def broadcast_scalar(value: float, root: int = 0) -> float:
    """Agree on a host-local scalar across processes (stop flags, epochs).

    Single-process: identity. Multi-host: ships host-0's value through a tiny
    replicated device computation (the JAX analog of broadcast_object_list).
    """
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils

    arr = np.asarray([value if jax.process_index() == root else 0.0], np.float32)
    out = multihost_utils.broadcast_one_to_all(arr, is_source=jax.process_index() == root)
    return float(out[0])


def all_reduce_scalar(value: float, op: str = "sum") -> float:
    """Combine a host-local scalar across processes (e.g. global batch counts)."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils

    arr = np.asarray([value], np.float32)
    gathered = multihost_utils.process_allgather(arr)
    if op == "sum":
        return float(gathered.sum())
    if op == "max":
        return float(gathered.max())
    if op == "min":
        return float(gathered.min())
    raise ValueError(op)


def sync_processes() -> None:
    """Barrier across hosts (no-op single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("yolo_infer_tpu_barrier")
