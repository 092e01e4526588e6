"""Device mesh + sharding utilities (the TPU replacement for DDP).

The reference scales by delegating to Ultralytics/NCCL DDP with a device
string (reference core/trainer.py:695-716) and participates in the DDP
protocol directly (robust_trainer.py:337-339,403-404,420-425). TPU-native we
use a single-controller `jax.sharding.Mesh` with two axes:

  data  — batch sharding (DP); gradients are reduced by XLA-inserted
          collectives over ICI, replacing NCCL all-reduce
  model — output-channel sharding of the widest convolutions (TP); optional,
          defaults to 1 since YOLO11 fits on one chip comfortably

Shardings are expressed as NamedSharding annotations on the params/batch
pytrees; XLA GSPMD propagates them through the whole step function and
inserts psum/all-gather where needed (SURVEY.md §2c).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# channels >= this get model-axis sharding when tp > 1
TP_MIN_CHANNELS = 256


def create_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the first n_devices devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    devices = devices[:n]
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp({dp}) * tp({tp}) != n_devices({n})")
    mesh_devices = np.asarray(devices).reshape(dp, tp)
    return Mesh(mesh_devices, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_pspec(path_leaf: Any, tp: int) -> P:
    """PartitionSpec for one param leaf: model-shard wide conv output channels."""
    x = path_leaf
    if tp > 1 and hasattr(x, "ndim"):
        if x.ndim == 4 and x.shape[-1] >= TP_MIN_CHANNELS and x.shape[-1] % tp == 0:
            return P(None, None, None, "model")  # HWIO: shard Cout
        if x.ndim == 1 and x.shape[0] >= TP_MIN_CHANNELS and x.shape[0] % tp == 0:
            return P("model")  # per-channel scale/bias
    return P()


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a params pytree on the mesh (TP channel sharding if model axis > 1)."""
    tp = mesh.shape["model"]

    def _place(x):
        spec = param_pspec(x, tp)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(_place, params)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard leading (batch) axis of every leaf over the data axis."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def params_shardings(params: Any, mesh: Mesh) -> Any:
    """The NamedSharding tree matching `shard_params` (for jit in/out specs)."""
    tp = mesh.shape["model"]
    return jax.tree_util.tree_map(lambda x: NamedSharding(mesh, param_pspec(x, tp)), params)
