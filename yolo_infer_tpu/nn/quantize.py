"""int8 quantization primitives + the calibration/quantization context.

TPU-native replacement for the fbgemm/qnnpack eager quantization the
reference drives through torch.quantization (reference optimization/
quantization/quantizers.py:42-46,124-129; SURVEY.md §2b int8 row): weights
are quantized per-output-channel to int8, activations per-tensor
(dynamically at runtime or with static calibrated scales), and the conv
itself runs int8 x int8 -> int32 on the MXU, rescaled in fp32.

Serving-path design (measured on v5e, tools/microbench_int8.py): the win
over bf16 comes from int8 RESIDENCY — activations crossing HBM at 1 byte —
not from raw MXU rate. So in "static8" mode every quantized conv consumes
and produces `QAct` (an int8 tensor + fp32 scale): the requantize step fuses
into the conv epilogue (int32 -> fp32 rescale -> bias -> SiLU -> int8), and
structural ops (concat / maxpool / upsample / split) run directly on int8.
Adds and attention stay float for accuracy (they re-enter int8 at the next
conv via its calibrated input scale). The old per-conv fp32 round-trip
("dynamic" mode) is kept for calibration-free use.

Calibration correspondence is ORDER-BASED: the model DAG executes its convs
in a fixed deterministic order under tracing, so an "observe" pass collects
(input absmax, output absmax) per QUANTIZED conv and a "static8" pass
consumes scales by the same index — no named hooks needed (the functional
analog of torch observer modules).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

INT8_MAX = 127.0


# ---------------------------------------------------------------------------
# QAct: a quantized activation flowing through the DAG (x ~= q * s)
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class QAct:
    """int8 activation tensor + per-tensor fp32 scale."""

    q: jnp.ndarray  # int8
    s: jnp.ndarray  # f32 scalar

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):  # reported as the logical (dequantized) dtype
        return jnp.float32

    def dequant(self, dtype=jnp.float32) -> jnp.ndarray:
        return (self.q.astype(jnp.float32) * self.s).astype(dtype)

    def tree_flatten(self):
        return (self.q, self.s), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def quantize_act(x: jnp.ndarray, scale: jnp.ndarray) -> QAct:
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return QAct(q, jnp.asarray(scale, jnp.float32))


def as_float(x: Any, dtype=jnp.float32) -> jnp.ndarray:
    return x.dequant(dtype) if isinstance(x, QAct) else x


def q_concat(xs: List[Any], axis: int = -1) -> Any:
    """Concat that stays int8 when every input is QAct (scale = max, each
    input requantized — <=0.5-step rounding); mixed inputs fall back to fp."""
    if all(isinstance(x, QAct) for x in xs):
        s = xs[0].s
        for x in xs[1:]:
            s = jnp.maximum(s, x.s)
        parts = [
            jnp.clip(jnp.round(x.q.astype(jnp.float32) * (x.s / s)), -127, 127).astype(jnp.int8)
            for x in xs
        ]
        return QAct(jnp.concatenate(parts, axis=axis), s)
    dt = next((x.dtype for x in xs if not isinstance(x, QAct)), jnp.float32)
    return jnp.concatenate([as_float(x, dt) for x in xs], axis=axis)


def q_add(a: Any, b: Any):
    """Residual add: computed in float (int8 re-entry happens at the next
    conv via its calibrated input scale — avoids compounding add scales)."""
    if isinstance(a, QAct) or isinstance(b, QAct):
        dt = b.dtype if not isinstance(b, QAct) else (a.dtype if not isinstance(a, QAct) else jnp.bfloat16)
        return as_float(a, dt) + as_float(b, dt)
    return a + b


def q_split2(x: Any, axis: int = -1):
    if isinstance(x, QAct):
        a, b = jnp.split(x.q, 2, axis=axis)
        return QAct(a, x.s), QAct(b, x.s)
    return jnp.split(x, 2, axis=axis)


def q_split_at(x: Any, c: int, axis: int = -1):
    if isinstance(x, QAct):
        a, b = jnp.split(x.q, [c], axis=axis)
        return QAct(a, x.s), QAct(b, x.s)
    return jnp.split(x, [c], axis=axis)


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

    Kept float (the same exemptions fbgemm-style pipelines apply):
      * output projections — the final conv of each head branch chain (the
        last element of a branch list, run via apply_conv2d_bias): quantizing
        logit/box-regression layers costs accuracy for negligible speed;
      * attention subtrees (key "attn") — their outputs feed reshapes/einsums
        that need float, and the C2PSA maps are tiny (<=20x20);
      * depthwise convs (HWIO with I == 1) — they never land on the MXU, so
        int8 buys no compute and risks accuracy in the head's cls branch.
    """

    def _is_conv_node(p) -> bool:
        return isinstance(p, dict) and "w" in p and getattr(p["w"], "ndim", 0) == 4

    def _is_dw(p) -> bool:
        return p["w"].shape[2] == 1 and p["w"].shape[3] > 1

    def _walk(p, is_branch_tail: bool = False):
        if isinstance(p, dict):
            if _is_conv_node(p):
                return dict(p) if (is_branch_tail or _is_dw(p)) else quantize_conv_params(p)
            return {k: (_walk(v) if k != "attn" else v) for k, v in p.items()}
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
      "observe" — at each QUANTIZED ('w_q') conv, run a dequantized-fp conv
                  and record (input absmax, output absmax) in order
      "static"  — legacy: consume per-conv INPUT scales in order; conv inputs
                  and outputs round-trip through fp (one (n,) scale per conv)
      "static8" — int8-residency serving path: consume (in, out) scale pairs
                  (an (n, 2) array) in order; convs consume/produce QAct
      "fake"    — QAT fake-quant of weights+activations (uses static scales
                  when available, else dynamic)
    """

    mode: str
    collected: List[jnp.ndarray] = dataclasses.field(default_factory=list)
    act_scales: Optional[jnp.ndarray] = None  # (n,) static | (n, 2) static8
    index: int = 0
    epilogue_dtype: Any = None  # static8 epilogue compute dtype (default bf16)
    float_convs: Optional[set] = None  # static8: conv indices forced to run
    # dequantized-fp (first-layer exemption / perf ablation)
    int8_min_channels: int = 128  # static8: convs with min(Cin, Cout) below
    # this run dequantized-bf16. Measured on v5e (tools/bench_pallas_conv.py
    # boundary sweep): int8 convs WIN at C>=128 (1.10-1.32x bf16), sit at
    # ~0.93-0.99x for C=64, and collapse to 0.34x at C=32 with large
    # batch*spatial — the source of the round-2 b32 e2e regression.
    int8_c64_min_rows: int = dataclasses.field(
        default_factory=lambda: int(os.environ.get("YOLO_INT8_C64_MIN_ROWS", 400_000))
    )  # C=64 convs quantize when their input rows N*H*W reach this volume —
    # the shape-aware generalization of the old "batch >= 64 at 640" rule
    # (at 640, b64 puts the 80x80 C=64 level at 409.6k rows). Overridable by
    # env for hardware calibration sweeps (tools/bench_quant_e2e.py).

    def observe(self, x: jnp.ndarray) -> None:
        self.collected.append(jnp.max(jnp.abs(x.astype(jnp.float32))))

    def observe_pair(self, x: jnp.ndarray, y: jnp.ndarray) -> None:
        self.collected.append(
            jnp.stack([
                jnp.max(jnp.abs(x.astype(jnp.float32))),
                jnp.max(jnp.abs(y.astype(jnp.float32))),
            ])
        )

    def next_scale(self) -> jnp.ndarray:
        i = self.index
        self.index += 1
        return jnp.maximum(self.act_scales[i], 1e-6) / INT8_MAX

    def next_scale_pair(self):
        i = self.index
        self.index += 1
        pair = jnp.maximum(self.act_scales[i], 1e-6) / INT8_MAX
        return pair[0], pair[1]


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
