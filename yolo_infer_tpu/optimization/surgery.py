"""Physical structured pruning: channel SURGERY, not masks.

`channel_masks` (optimization/pruning.py) zeroes channels but XLA still
compiles the dense shapes — masked models run at dense speed. This module
physically REMOVES channels from the weight tree so the compiled program is
genuinely smaller: fewer MXU FLOPs, less weight HBM traffic, a real speedup.
The reference's pruning surface (reference optimization/base.py:264-288) is a
declared stub; torch's own `nn.utils.prune` masks have the same
no-speedup property surgery fixes here.

Design — internal slimming over dependency groups:

Every pruned "channel group" is strictly INTERNAL to one block: a producer
conv's output channels consumed only by the listed consumers inside the same
block. All inter-layer interfaces (concat widths, residual channel counts,
the C3k2 `q_split2` halves, head map channels, backbone taps) are untouched,
so the DAG executor (models/yolo11.py:forward) runs the slimmed tree
unchanged — shapes are read from the weights at trace time.

Groups handled (and the coupling each one carries):

  Bottleneck       hidden: cv1.out ↔ cv2.in
  C3k              a-chain outer: cv1.out ↔ m[i].cv1.in ↔ m[i].cv2.out
                     (residual adds tie the whole chain) ↔ cv3.in[seg 0]
                   b path: cv2.out ↔ cv3.in[seg 1]
                   + each inner bottleneck hidden
  SPPF             hidden: cv1.out ↔ cv2.in at 4 concat offsets
  C2PSA            per PSABlock FFN hidden: ffn1.out ↔ ffn2.in
                     (attention qkv/proj/pe untouched: head-dim structure)
  Detect cv2       conv0.out↔conv1.in and conv1.out↔pred.in
  Detect cv3       conv1.out ↔ dw2 (depthwise pass-through) ↔ conv3.in,
                   conv3.out ↔ pred.in
  Segment/Pose/OBB cv4 branch hiddens (same shape as cv2)
  Segment proto    cv1.out↔up.I, up.O↔cv2.in, cv2.out↔cv3.in
  Classify         conv.out ↔ linear.in (pooled features map 1:1)

Channel importance = Σ over the group's producers of ‖w[..., c]‖₂·|γ[c]|
(the BN-scaled output magnitude). Kept counts are rounded UP to a multiple
of `align` (default 8) so every surviving dim stays TPU-tile friendly; a
group whose aligned keep count equals its width is skipped (reported).

Equivalence invariant (tested): removing a group is EXACTLY equivalent to
zeroing its producers' (w, γ, β[, b]) — BN of a zeroed channel emits 0,
SiLU(0)=0, and a zero channel contributes nothing through any consumer — so
`slim_model` + `zero_removed` let tests assert slim(params) ≡ zero(params)
to float tolerance.

Works on training-form params (+BN state) and on fused {'w','b'} deploy
trees. Quantized trees ('w_q') are rejected — re-quantize after surgery.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


# --------------------------------------------------------------------- plan


@dataclasses.dataclass
class Member:
    """One tensor-slice participating in a group.

    kind: 'out'      conv block output channels (w last axis, γ/β/b, BN state)
          'in'       conv input channels (w axis 2); `index` overrides keep
          'dw'       depthwise pass-through (w last axis + γ/β + state)
          'up_i'     transposed-conv input axis (wt axis 3)
          'up_o'     transposed-conv output axis (wt axis 2) + bias
          'dense_in' dense weight input axis (w axis 0)
    """

    path: str
    kind: str
    index: Optional[np.ndarray] = None  # 'in' consumers with concat offsets


@dataclasses.dataclass
class Group:
    name: str
    width: int
    keep: Optional[np.ndarray]  # None = skipped (kept whole)
    members: List[Member]

    @property
    def kept(self) -> int:
        return self.width if self.keep is None else int(self.keep.size)


# ------------------------------------------------------------------ helpers


def _f32(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def _col_norms(conv: Dict[str, Any]) -> np.ndarray:
    """BN-scaled L2 norm per output channel of one conv dict."""
    w = _f32(conv["w"])
    n = np.sqrt((w.reshape(-1, w.shape[-1]) ** 2).sum(axis=0))
    if "gamma" in conv:
        n = n * np.abs(_f32(conv["gamma"]))
    return n


def _select(imp: np.ndarray, keep_frac: float, align: int) -> Optional[np.ndarray]:
    """Top-k keep indices (sorted), k rounded UP to `align`; None = skip."""
    c = int(imp.size)
    k = int(round(c * keep_frac))
    k = max(align, int(-(-k // align) * align))
    if k >= c:
        return None
    return np.sort(np.argpartition(-imp, k - 1)[:k])


def _slice_last(x, keep):
    return np.asarray(x)[..., keep]


def _apply_member(params_root, state_root, m: Member, keep: np.ndarray) -> None:
    p = _resolve(params_root, m.path)
    s = _resolve(state_root, m.path) if state_root is not None else None
    idx = m.index if m.index is not None else keep
    if m.kind == "out":
        p["w"] = _slice_last(p["w"], idx)
        for k in ("gamma", "beta", "b"):
            if k in p:
                p[k] = np.asarray(p[k])[idx]
        if s:
            for k in ("mean", "var"):
                if k in s:
                    s[k] = np.asarray(s[k])[idx]
    elif m.kind == "in":
        p["w"] = np.asarray(p["w"])[:, :, idx, :]
    elif m.kind == "dw":
        p["w"] = _slice_last(p["w"], idx)
        for k in ("gamma", "beta", "b"):
            if k in p:
                p[k] = np.asarray(p[k])[idx]
        if s:
            for k in ("mean", "var"):
                if k in s:
                    s[k] = np.asarray(s[k])[idx]
    elif m.kind == "up_i":
        p["wt"] = np.asarray(p["wt"])[:, :, :, idx]
    elif m.kind == "up_o":
        p["wt"] = np.asarray(p["wt"])[:, :, idx, :]
        if "b" in p:
            p["b"] = np.asarray(p["b"])[idx]
    elif m.kind == "dense_in":
        p["w"] = np.asarray(p["w"])[idx, :]
    else:  # pragma: no cover
        raise ValueError(m.kind)


def _resolve(root, path: str):
    cur = root
    for part in path.split("."):
        if cur is None:
            return None
        cur = cur[int(part)] if isinstance(cur, (list, tuple)) else cur.get(part)
    return cur


def _copy_tree(t):
    return jax.tree_util.tree_map(lambda x: np.array(x), t)


def _to_jnp(t):
    return jax.tree_util.tree_map(jnp.asarray, t)


# ---------------------------------------------------------- per-block groups


def _bottleneck_hidden(path: str, p, keep_frac, align) -> List[Group]:
    keep = _select(_col_norms(p["cv1"]), keep_frac, align)
    return [Group(
        name=f"{path}:hidden", width=int(np.asarray(p["cv1"]["w"]).shape[-1]), keep=keep,
        members=[Member(f"{path}.cv1", "out"), Member(f"{path}.cv2", "in")],
    )]


def _c3k_groups(path: str, p, keep_frac, align) -> List[Group]:
    c_ = int(np.asarray(p["cv1"]["w"]).shape[-1])
    n_m = len(p["m"])
    # a-chain outer (residual-tied across the whole chain)
    imp_a = _col_norms(p["cv1"])
    for m in p["m"]:
        imp_a = imp_a + _col_norms(m["cv2"])
    keep_a = _select(imp_a, keep_frac, align)
    keep_b = _select(_col_norms(p["cv2"]), keep_frac, align)

    a_members = [Member(f"{path}.cv1", "out")]
    for i in range(n_m):
        a_members += [Member(f"{path}.m.{i}.cv1", "in"), Member(f"{path}.m.{i}.cv2", "out")]
    b_members = [Member(f"{path}.cv2", "out")]

    # cv3 consumes concat([a, b]); build its input index from both keeps
    ia = keep_a if keep_a is not None else np.arange(c_)
    ib = keep_b if keep_b is not None else np.arange(c_)
    cv3_index = np.concatenate([ia, c_ + ib])
    cv3 = Member(f"{path}.cv3", "in", index=cv3_index)

    groups = [
        Group(f"{path}:a", c_, keep_a, a_members),
        Group(f"{path}:b", c_, keep_b, b_members + ([cv3] if keep_a is None else [])),
    ]
    if keep_a is not None:
        groups[0].members.append(cv3)  # exactly one group applies the cv3 slice
    elif keep_b is None:
        groups[1].members.remove(cv3)  # nothing to slice
    for i, m in enumerate(p["m"]):
        groups += _bottleneck_hidden(f"{path}.m.{i}", m, keep_frac, align)
    return groups


def _select_k(imp: np.ndarray, k: int) -> np.ndarray:
    return np.sort(np.argpartition(-imp, k - 1)[:k])


def _c3k2_chunk_groups(path: str, p, c3k: bool, keep_frac, align) -> List[Group]:
    """Slim the C3k2 chunk channels themselves (the outer dims of the block's
    3x3 convs). Constraints honored:
      * `q_split2` halves cv1's output evenly -> the a- and b-chunk keep the
        SAME count (indices may differ), so cv1 is sliced once with the
        combined index and the split point stays exact.
      * non-c3k: residual adds tie b and every bottleneck output into ONE
        group (same keep at every concat segment).
      * c3k:    the chain has no outer residual, so b and each C3k output
        y_i are INDEPENDENT groups; C3k's own cv1+cv2 both consume the link.
      * cv2 consumes concat([a, b, y_1..y_n]); its input index is assembled
        across all segment keeps and applied exactly once.
    """
    c2x = int(np.asarray(p["cv1"]["w"]).shape[-1])
    c = c2x // 2
    n_m = len(p["m"])

    cols = _col_norms(p["cv1"])
    imp_a, imp_b = cols[:c].copy(), cols[c:].copy()
    if not c3k:  # residual chain: every m output shares the b channel space
        for m in p["m"]:
            imp_b = imp_b + _col_norms(m["cv2"])
    keep_a = _select(imp_a, keep_frac, align)
    keep_b = _select(imp_b, keep_frac, align)
    if keep_a is None or keep_b is None:
        keep_a = keep_b = None  # split2 needs equal halves: all or nothing
    elif keep_a.size != keep_b.size:
        k = max(keep_a.size, keep_b.size)
        keep_a, keep_b = _select_k(imp_a, k), _select_k(imp_b, k)

    ia = keep_a if keep_a is not None else np.arange(c)
    ib = keep_b if keep_b is not None else np.arange(c)
    seg_keeps: List[np.ndarray] = [ia, ib]
    groups: List[Group] = []

    if keep_a is not None:
        ga = Group(f"{path}:chunk_a", c, keep_a,
                   [Member(f"{path}.cv1", "out", index=np.concatenate([ia, c + ib]))])
        gb_members: List[Member] = []
        if c3k:
            gb_members += [Member(f"{path}.m.0.cv1", "in", index=keep_b),
                           Member(f"{path}.m.0.cv2", "in", index=keep_b)]
        else:
            for i in range(n_m):
                gb_members += [Member(f"{path}.m.{i}.cv1", "in"),
                               Member(f"{path}.m.{i}.cv2", "out")]
        groups += [ga, Group(f"{path}:chunk_b", c, keep_b, gb_members)]

    if c3k:  # chain link groups: y_i = m[i].cv3 output feeds m[i+1] + concat
        for i in range(n_m):
            cv3 = p["m"][i]["cv3"]
            cy = int(np.asarray(cv3["w"]).shape[-1])
            keep_y = _select(_col_norms(cv3), keep_frac, align)
            members = [Member(f"{path}.m.{i}.cv3", "out")]
            if i + 1 < n_m and keep_y is not None:
                members += [Member(f"{path}.m.{i + 1}.cv1", "in"),
                            Member(f"{path}.m.{i + 1}.cv2", "in")]
            groups.append(Group(f"{path}:y{i}", cy, keep_y, members))
            seg_keeps.append(keep_y if keep_y is not None else np.arange(cy))
    else:  # residual: every chain segment shares the b keep
        seg_keeps += [ib] * n_m

    if any(g.keep is not None for g in groups):
        offsets = np.cumsum([0] + [c] * (len(seg_keeps) - 1))
        idx = np.concatenate([off + sk for off, sk in zip(offsets, seg_keeps)])
        host = next(g for g in groups if g.keep is not None)
        host.members.append(Member(f"{path}.cv2", "in", index=idx))
    return groups


def _c3k2_groups(path: str, p, c3k: bool, keep_frac, align, chunks: bool = True) -> List[Group]:
    groups: List[Group] = []
    for i, m in enumerate(p["m"]):
        if c3k:
            groups += _c3k_groups(f"{path}.m.{i}", m, keep_frac, align)
        else:
            groups += _bottleneck_hidden(f"{path}.m.{i}", m, keep_frac, align)
    if chunks:
        groups += _c3k2_chunk_groups(path, p, c3k, keep_frac, align)
    return groups


def _sppf_groups(path: str, p, keep_frac, align) -> List[Group]:
    c_ = int(np.asarray(p["cv1"]["w"]).shape[-1])
    keep = _select(_col_norms(p["cv1"]), keep_frac, align)
    members = [Member(f"{path}.cv1", "out")]
    if keep is not None:
        idx = np.concatenate([keep + j * c_ for j in range(4)])
        members.append(Member(f"{path}.cv2", "in", index=idx))
    return [Group(f"{path}:hidden", c_, keep, members)]


def _c2psa_groups(path: str, p, keep_frac, align) -> List[Group]:
    groups = []
    for i, m in enumerate(p["m"]):
        keep = _select(_col_norms(m["ffn1"]), keep_frac, align)
        groups.append(Group(
            f"{path}.m.{i}:ffn", int(np.asarray(m["ffn1"]["w"]).shape[-1]), keep,
            [Member(f"{path}.m.{i}.ffn1", "out"), Member(f"{path}.m.{i}.ffn2", "in")],
        ))
    return groups


def _chain_groups(path: str, branch: Sequence[Dict[str, Any]], links: Sequence[Tuple[int, Optional[int], int]],
                  keep_frac, align) -> List[Group]:
    """Groups for a conv chain. links: (producer_idx, dw_idx or None, consumer_idx)."""
    groups = []
    for prod, dw, cons in links:
        keep = _select(_col_norms(branch[prod]), keep_frac, align)
        members = [Member(f"{path}.{prod}", "out")]
        if dw is not None:
            members.append(Member(f"{path}.{dw}", "dw"))
        members.append(Member(f"{path}.{cons}", "in"))
        groups.append(Group(
            f"{path}.{prod}:out", int(np.asarray(branch[prod]["w"]).shape[-1]), keep, members,
        ))
    return groups


def _proto_groups(path: str, p, keep_frac, align) -> List[Group]:
    c_ = int(np.asarray(p["cv1"]["w"]).shape[-1])
    g1 = Group(f"{path}.cv1:out", c_, _select(_col_norms(p["cv1"]), keep_frac, align),
               [Member(f"{path}.cv1", "out"), Member(f"{path}.up", "up_i")])
    wt = _f32(p["up"]["wt"])  # (kh, kw, O, I)
    up_imp = np.sqrt((wt.transpose(2, 0, 1, 3).reshape(wt.shape[2], -1) ** 2).sum(axis=1))
    g2 = Group(f"{path}.up:out", int(wt.shape[2]), _select(up_imp, keep_frac, align),
               [Member(f"{path}.up", "up_o"), Member(f"{path}.cv2", "in")])
    g3 = Group(f"{path}.cv2:out", int(np.asarray(p["cv2"]["w"]).shape[-1]),
               _select(_col_norms(p["cv2"]), keep_frac, align),
               [Member(f"{path}.cv2", "out"), Member(f"{path}.cv3", "in")])
    return [g1, g2, g3]


def _head_groups(path: str, p, keep_frac, align) -> List[Group]:
    groups: List[Group] = []
    for i, branch in enumerate(p["cv2"]):
        groups += _chain_groups(f"{path}.cv2.{i}", branch, [(0, None, 1), (1, None, 2)], keep_frac, align)
    for i, branch in enumerate(p["cv3"]):
        # [dw(c,c), conv(c,c3), dw(c3,c3), conv(c3,c3), pred(c3,nc)]
        groups += _chain_groups(f"{path}.cv3.{i}", branch, [(1, 2, 3), (3, None, 4)], keep_frac, align)
    if "cv4" in p:
        for i, branch in enumerate(p["cv4"]):
            groups += _chain_groups(f"{path}.cv4.{i}", branch, [(0, None, 1), (1, None, 2)], keep_frac, align)
    if "proto" in p:
        groups += _proto_groups(f"{path}.proto", p["proto"], keep_frac, align)
    return groups


def _classify_groups(path: str, p, keep_frac, align) -> List[Group]:
    keep = _select(_col_norms(p["conv"]), keep_frac, align)
    return [Group(f"{path}.conv:out", int(np.asarray(p["conv"]["w"]).shape[-1]), keep,
                  [Member(f"{path}.conv", "out"), Member(f"{path}.linear", "dense_in")])]


# ----------------------------------------------------------------- top level


def build_plan(params: Dict[str, Any], spec, keep_frac: float = 0.5, align: int = 8,
               chunks: bool = True) -> List[Group]:
    """Compute all slimming groups + keep sets (no mutation).

    chunks=False restricts surgery to strictly-hidden dims (no C3k2
    chunk/chain slimming) — useful for debugging or gentler pruning.
    """
    for leaf_path in ("w_q",):
        if any(leaf_path in d for d in _walk_dicts(params)):
            raise ValueError("physical surgery requires float weights; re-quantize after slimming")
    groups: List[Group] = []
    for layer in spec.layers:
        key = str(layer.idx)
        if key not in params:
            continue
        p = params[key]
        t = layer.typ
        if t == "C3k2":
            groups += _c3k2_groups(key, p, layer.kw["c3k"], keep_frac, align, chunks=chunks)
        elif t == "SPPF":
            groups += _sppf_groups(key, p, keep_frac, align)
        elif t == "C2PSA":
            groups += _c2psa_groups(key, p, keep_frac, align)
        elif t in ("Detect", "Segment", "Pose", "OBB"):
            groups += _head_groups(key, p, keep_frac, align)
        elif t == "Classify":
            groups += _classify_groups(key, p, keep_frac, align)
        # plain Conv / Upsample / Concat: outputs are inter-layer interfaces
    return groups


def _walk_dicts(t):
    if isinstance(t, dict):
        yield t
        for v in t.values():
            yield from _walk_dicts(v)
    elif isinstance(t, (list, tuple)):
        for v in t:
            yield from _walk_dicts(v)


def slim_model(params, state, spec, keep_frac: float = 0.5, align: int = 8,
               chunks: bool = True):
    """Physically remove low-importance internal channels.

    Returns (new_params, new_state, plan, report). `state` may be None
    (fused deploy tree). The returned trees are fresh jnp arrays; inputs are
    not mutated.
    """
    plan = build_plan(params, spec, keep_frac, align, chunks=chunks)
    new_p = _copy_tree(params)
    new_s = _copy_tree(state) if state is not None else None
    n_before = sum(int(np.asarray(x).size) for x in jax.tree_util.tree_leaves(params))
    for g in plan:
        if g.keep is None:
            continue
        for m in g.members:
            _apply_member(new_p, new_s, m, g.keep)
    new_p = _to_jnp(new_p)
    new_s = _to_jnp(new_s) if new_s is not None else None
    n_after = sum(int(np.asarray(x).size) for x in jax.tree_util.tree_leaves(new_p))
    report = {
        "groups_total": len(plan),
        "groups_slimmed": sum(1 for g in plan if g.keep is not None),
        "channels_before": sum(g.width for g in plan),
        "channels_after": sum(g.kept for g in plan),
        "params_before": n_before,
        "params_after": n_after,
        "params_ratio": n_after / max(n_before, 1),
        "keep_frac": keep_frac,
        "align": align,
    }
    return new_p, new_s, plan, report


def zero_removed(params, state, plan) -> Tuple[Any, Any]:
    """Zero (instead of remove) every pruned channel — the masked twin of
    `slim_model` used to prove slim ≡ zero. Only producer-side members need
    zeroing: w column + γ + β (+ b) makes the channel emit exactly 0."""
    new_p = _copy_tree(params)
    new_s = _copy_tree(state) if state is not None else None
    for g in plan:
        if g.keep is None:
            continue
        rm_group = np.setdiff1d(np.arange(g.width), g.keep)
        for m in g.members:
            p = _resolve(new_p, m.path)
            if m.kind == "out":
                # an explicit index spans the member's whole axis (e.g. a
                # partially-sliced multi-chunk producer) — complement it there
                rm = (np.setdiff1d(np.arange(p["w"].shape[-1]), m.index)
                      if m.index is not None else rm_group)
                p["w"][..., rm] = 0
                for k in ("gamma", "beta", "b"):
                    if k in p:
                        p[k][rm] = 0
            elif m.kind == "dw":
                for k in ("gamma", "beta", "b"):
                    if k in p:
                        p[k][rm_group] = 0
            elif m.kind == "up_o":
                p["wt"][:, :, rm_group, :] = 0
                if "b" in p:
                    p["b"][rm_group] = 0
    return _to_jnp(new_p), (_to_jnp(new_s) if new_s is not None else None)
