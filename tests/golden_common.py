"""Deterministic weight synthesis for the golden-activation fixtures.

Both the fixture generator (tools/make_golden.py, torch required, run once)
and the fixture test (tests/test_golden.py, torch-free) must produce the SAME
flat state dict from a (name, shape) manifest. Each tensor is derived from a
name-seeded RNG with value ranges chosen so activations stay finite through
the full 24-layer graph (BN variances positive, conv weights fan-in scaled).

This is what lets the committed .npz fixtures stay tiny: they record the
manifest + input + golden torch outputs, never the weights themselves.
"""

from __future__ import annotations

import zlib
from typing import Dict, List, Sequence, Tuple

import numpy as np

GOLDEN_VERSION = 1  # bump if the fill rules change (regenerating fixtures)


def golden_array(name: str, shape: Sequence[int]) -> np.ndarray:
    """Deterministic tensor for a torch state-dict entry."""
    rng = np.random.default_rng(zlib.crc32(f"v{GOLDEN_VERSION}:{name}".encode()))
    shape = tuple(int(s) for s in shape)
    if name.endswith("running_var"):
        return rng.uniform(0.5, 1.5, shape).astype(np.float32)
    if name.endswith("running_mean"):
        return rng.uniform(-0.2, 0.2, shape).astype(np.float32)
    if name.endswith("num_batches_tracked"):
        return np.zeros(shape, np.int64)
    if ".bn.weight" in name or name.endswith("bn.weight"):
        return rng.uniform(0.8, 1.2, shape).astype(np.float32)
    if name.endswith(".bias"):
        return rng.uniform(-0.1, 0.1, shape).astype(np.float32)
    # conv (O,I,kh,kw), conv-transpose (I,O,kh,kw), linear (out,in).
    # Unit fan-in gain: activations stay O(0.1) through the 24-layer graph
    # (gain 2.0 explodes to ~6e8 via the residual chains; 0.5 decays to
    # noise-level at the heads — measured while generating v1).
    fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else max(shape[0], 1)
    return (rng.standard_normal(shape) * (1.0 / np.sqrt(fan_in))).astype(np.float32)


def golden_state_dict(names: Sequence[str], shapes: Sequence[Sequence[int]]) -> Dict[str, np.ndarray]:
    return {n: golden_array(n, s) for n, s in zip(names, shapes)}


def pack_manifest(shapes: Sequence[Sequence[int]]) -> Tuple[np.ndarray, np.ndarray]:
    """Shapes -> (flat int64 array, ndims array) for npz storage."""
    flat = np.asarray([d for s in shapes for d in s], np.int64)
    ndims = np.asarray([len(s) for s in shapes], np.int64)
    return flat, ndims


def unpack_manifest(flat: np.ndarray, ndims: np.ndarray) -> List[Tuple[int, ...]]:
    shapes: List[Tuple[int, ...]] = []
    pos = 0
    for nd in ndims:
        shapes.append(tuple(int(v) for v in flat[pos : pos + nd]))
        pos += int(nd)
    return shapes


def golden_input(hw: int = 96, seed: int = 1234) -> np.ndarray:
    """Deterministic NHWC float input in [0, 1]."""
    rng = np.random.default_rng(seed)
    return rng.uniform(0.0, 1.0, (1, hw, hw, 3)).astype(np.float32)
