"""int8 quantization primitives + the calibration/quantization context.

TPU-native replacement for the fbgemm/qnnpack eager quantization the
reference drives through torch.quantization (reference optimization/
quantization/quantizers.py:42-46,124-129; SURVEY.md §2b int8 row): weights
are quantized per-output-channel to int8, activations per-tensor
(dynamically at runtime or with static calibrated scales), and the conv
itself runs int8 x int8 -> int32 on the MXU (v5e does 2x int8 throughput vs
bf16), rescaled in fp32.

Calibration correspondence is ORDER-BASED: the model DAG executes its convs
in a fixed deterministic order under tracing, so an "observe" pass collects
one absmax per conv and a "static" pass consumes scales by the same index —
no named hooks needed (the functional analog of torch observer modules).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

INT8_MAX = 127.0


# ---------------------------------------------------------------------------
# weight quantization
# ---------------------------------------------------------------------------

def quantize_weights_per_channel(w: jnp.ndarray):
    """HWIO fp weights -> (int8 weights, per-Cout fp32 scales)."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=(0, 1, 2))  # (Cout,)
    scale = jnp.maximum(absmax / INT8_MAX, 1e-12)
    w_q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def dequantize_weights(w_q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.float32):
    return (w_q.astype(jnp.float32) * scale).astype(dtype)


def quantize_conv_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Fold-time conversion of one deploy conv node {'w','b'} -> int8 form."""
    out: Dict[str, Any] = {}
    w_q, scale = quantize_weights_per_channel(params["w"])
    out["w_q"] = w_q
    out["w_scale"] = scale
    if "b" in params:
        out["b"] = params["b"].astype(jnp.float32)
    return out


def quantize_params_tree(params: Any) -> Any:
    """Quantize every conv kernel in a deploy (BN-folded) params tree.

    Output projections — the final conv of each head branch chain (the last
    element of a branch list, executed via apply_conv2d_bias) — stay float:
    quantizing the logit/box-regression layers costs accuracy for negligible
    speed (they are 1x1 convs on tiny maps), the same first/last-layer
    exemption fbgemm-style pipelines apply.
    """

    def _is_conv_node(p) -> bool:
        return isinstance(p, dict) and "w" in p and getattr(p["w"], "ndim", 0) == 4

    def _walk(p, is_branch_tail: bool = False):
        if isinstance(p, dict):
            if _is_conv_node(p):
                return dict(p) if is_branch_tail else quantize_conv_params(p)
            return {k: _walk(v) for k, v in p.items()}
        if isinstance(p, list):
            return [
                _walk(x, is_branch_tail=(i == len(p) - 1 and _is_conv_node(x)))
                for i, x in enumerate(p)
            ]
        return p

    return _walk(params)


# ---------------------------------------------------------------------------
# activation quantization
# ---------------------------------------------------------------------------

def fake_quantize(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Quantize-dequantize with straight-through estimator (QAT)."""
    q = jnp.clip(jnp.round(x / scale), -127, 127) * scale
    return x + jax.lax.stop_gradient(q - x)


def dynamic_act_scale(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-6) / INT8_MAX


# ---------------------------------------------------------------------------
# quantization context (order-based observer/consumer)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class QuantContext:
    """Active during a single trace of the model forward.

    mode:
      "observe" — record each conv input's absmax (traced scalars) in order
      "static"  — consume pre-computed per-conv activation scales in order
      "fake"    — QAT fake-quant of weights+activations (uses static scales
                  when available, else dynamic)
    """

    mode: str
    collected: List[jnp.ndarray] = dataclasses.field(default_factory=list)
    act_scales: Optional[jnp.ndarray] = None  # (n_convs,) for "static"/"fake"
    index: int = 0

    def observe(self, x: jnp.ndarray) -> None:
        self.collected.append(jnp.max(jnp.abs(x.astype(jnp.float32))))

    def next_scale(self) -> jnp.ndarray:
        i = self.index
        self.index += 1
        return jnp.maximum(self.act_scales[i], 1e-6) / INT8_MAX


_ACTIVE: List[QuantContext] = []


def push_context(ctx: QuantContext) -> None:
    _ACTIVE.append(ctx)


def pop_context() -> QuantContext:
    return _ACTIVE.pop()


def current_context() -> Optional[QuantContext]:
    return _ACTIVE[-1] if _ACTIVE else None


class quant_context:
    """with quant_context(QuantContext(...)) as ctx: forward(...)"""

    def __init__(self, ctx: QuantContext):
        self.ctx = ctx

    def __enter__(self) -> QuantContext:
        push_context(self.ctx)
        return self.ctx

    def __exit__(self, *exc):
        pop_context()
        return False


# ---------------------------------------------------------------------------
# quantized conv execution
# ---------------------------------------------------------------------------

def quantized_conv2d(
    x: jnp.ndarray,
    w_q: jnp.ndarray,
    w_scale: jnp.ndarray,
    *,
    stride: int = 1,
    groups: int = 1,
    x_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """int8 conv with fp32 rescale. x fp -> per-tensor int8 (dynamic if
    x_scale is None), int32 MXU accumulation, per-channel dequant."""
    from jax import lax

    if x_scale is None:
        x_scale = dynamic_act_scale(x)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale), -127, 127).astype(jnp.int8)
    k = w_q.shape[0]
    p = k // 2
    y = lax.conv_general_dilated(
        x_q,
        w_q,
        window_strides=(stride, stride),
        padding=((p, p), (p, p)),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * (x_scale * w_scale)
