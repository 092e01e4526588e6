"""Independent torch implementation of the YOLO11 graph for converter tests.

Built from the same ModelSpec tables as the JAX implementation, with
ultralytics-compatible module naming (model.<i>.conv/bn/cv1/...), so that
`torch.save({"model": TorchYOLO11(spec)})` produces a checkpoint the
converter must load bit-faithfully. This is test scaffolding, written fresh
— it exists to prove (a) the converter's name mapping and (b) the JAX
forward's numerics against an independent implementation of the same spec.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn

from yolo_infer_tpu.models.spec import ModelSpec


def autopad(k):
    return k // 2


class TConv(nn.Module):
    def __init__(self, c1, c2, k=1, s=1, g=1, act=True):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, autopad(k), groups=g, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU() if act else nn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TDWConv(TConv):
    def __init__(self, c1, c2, k=3, s=1, act=True):
        super().__init__(c1, c2, k, s, g=math.gcd(c1, c2), act=act)


class TBottleneck(nn.Module):
    def __init__(self, c1, c2, shortcut=True, e=0.5, k=(3, 3)):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TConv(c1, c_, k[0])
        self.cv2 = TConv(c_, c2, k[1])
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC3k(nn.Module):
    def __init__(self, c1, c2, n=2, shortcut=True, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv(c1, c_, 1)
        self.cv3 = TConv(2 * c_, c2, 1)
        self.m = nn.Sequential(*(TBottleneck(c_, c_, shortcut, e=1.0) for _ in range(n)))

    def forward(self, x):
        return self.cv3(torch.cat([self.m(self.cv1(x)), self.cv2(x)], 1))


class TC3k2(nn.Module):
    def __init__(self, c1, c2, n, c3k, e=0.5, shortcut=True):
        super().__init__()
        self.c = int(c2 * e)
        self.cv1 = TConv(c1, 2 * self.c, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(
            TC3k(self.c, self.c, 2, shortcut) if c3k else TBottleneck(self.c, self.c, shortcut, e=0.5)
            for _ in range(n)
        )

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        for m in self.m:
            y.append(m(y[-1]))
        return self.cv2(torch.cat(y, 1))


class TSPPF(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv(c_ * 4, c2, 1)
        self.pool = nn.MaxPool2d(k, 1, k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        for _ in range(3):
            y.append(self.pool(y[-1]))
        return self.cv2(torch.cat(y, 1))


class TAttention(nn.Module):
    def __init__(self, dim, num_heads, attn_ratio=0.5):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.key_dim = int(self.head_dim * attn_ratio)
        self.scale = self.key_dim ** -0.5
        h = dim + num_heads * self.key_dim * 2
        self.qkv = TConv(dim, h, 1, act=False)
        self.proj = TConv(dim, dim, 1, act=False)
        self.pe = TConv(dim, dim, 3, g=dim, act=False)

    def forward(self, x):
        b, c, hh, ww = x.shape
        n = hh * ww
        qkv = self.qkv(x)
        q, k, v = qkv.view(b, self.num_heads, self.key_dim * 2 + self.head_dim, n).split(
            [self.key_dim, self.key_dim, self.head_dim], dim=2
        )
        attn = (q.transpose(-2, -1) @ k) * self.scale
        attn = attn.softmax(dim=-1)
        out = (v @ attn.transpose(-2, -1)).view(b, c, hh, ww) + self.pe(v.reshape(b, c, hh, ww))
        return self.proj(out)


class TPSABlock(nn.Module):
    def __init__(self, c, num_heads):
        super().__init__()
        self.attn = TAttention(c, num_heads)
        self.ffn = nn.Sequential(TConv(c, c * 2, 1), TConv(c * 2, c, 1, act=False))

    def forward(self, x):
        x = x + self.attn(x)
        return x + self.ffn(x)


class TC2PSA(nn.Module):
    def __init__(self, c1, n, e=0.5):
        super().__init__()
        self.c = int(c1 * e)
        self.cv1 = TConv(c1, 2 * self.c, 1)
        self.cv2 = TConv(2 * self.c, c1, 1)
        self.m = nn.Sequential(*(TPSABlock(self.c, max(self.c // 64, 1)) for _ in range(n)))

    def forward(self, x):
        a, b = self.cv1(x).split((self.c, self.c), dim=1)
        b = self.m(b)
        return self.cv2(torch.cat([a, b], 1))


class TDetect(nn.Module):
    def __init__(self, nc, ch, reg_max=16):
        super().__init__()
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = nn.ModuleList(
            nn.Sequential(TConv(c, c2, 3), TConv(c2, c2, 3), nn.Conv2d(c2, 4 * reg_max, 1)) for c in ch
        )
        self.cv3 = nn.ModuleList(
            nn.Sequential(
                nn.Sequential(TDWConv(c, c, 3), TConv(c, c3, 1)),
                nn.Sequential(TDWConv(c3, c3, 3), TConv(c3, c3, 1)),
                nn.Conv2d(c3, nc, 1),
            )
            for c in ch
        )

    def forward(self, xs):
        return [torch.cat([self.cv2[i](x), self.cv3[i](x)], 1) for i, x in enumerate(xs)]


class TProto(nn.Module):
    def __init__(self, c1, c_, nm):
        super().__init__()
        self.cv1 = TConv(c1, c_, 3)
        self.upsample = nn.ConvTranspose2d(c_, c_, 2, 2, 0, bias=True)
        self.cv2 = TConv(c_, c_, 3)
        self.cv3 = TConv(c_, nm, 1)

    def forward(self, x):
        return self.cv3(self.cv2(self.upsample(self.cv1(x))))


class TSegment(TDetect):
    def __init__(self, nc, ch, nm=32, reg_max=16):
        super().__init__(nc, ch, reg_max)
        c4 = max(ch[0] // 4, nm)
        c_proto = max(ch[0] // 4, nm * 2)
        self.cv4 = nn.ModuleList(
            nn.Sequential(TConv(c, c4, 3), TConv(c4, c4, 3), nn.Conv2d(c4, nm, 1)) for c in ch
        )
        self.proto = TProto(ch[0], c_proto, nm)

    def forward(self, xs):
        det = super().forward(xs)
        return det, {"mc": [self.cv4[i](x) for i, x in enumerate(xs)], "proto": self.proto(xs[0])}


class TPose(TDetect):
    def __init__(self, nc, ch, nk=51, reg_max=16):
        super().__init__(nc, ch, reg_max)
        c4 = max(ch[0] // 4, nk)
        self.cv4 = nn.ModuleList(
            nn.Sequential(TConv(c, c4, 3), TConv(c4, c4, 3), nn.Conv2d(c4, nk, 1)) for c in ch
        )

    def forward(self, xs):
        det = super().forward(xs)
        return det, {"kpts": [self.cv4[i](x) for i, x in enumerate(xs)]}


class TOBB(TDetect):
    def __init__(self, nc, ch, ne=1, reg_max=16):
        super().__init__(nc, ch, reg_max)
        c4 = max(ch[0] // 4, ne)
        self.cv4 = nn.ModuleList(
            nn.Sequential(TConv(c, c4, 3), TConv(c4, c4, 3), nn.Conv2d(c4, ne, 1)) for c in ch
        )

    def forward(self, xs):
        det = super().forward(xs)
        return det, {"angle": [self.cv4[i](x) for i, x in enumerate(xs)]}


class TClassify(nn.Module):
    """ultralytics Classify head: Conv(c1, 1280, 1) -> GAP -> Linear."""

    def __init__(self, c1, c2, c_=1280):
        super().__init__()
        self.conv = TConv(c1, c_, 1)
        self.pool = nn.AdaptiveAvgPool2d(1)
        self.linear = nn.Linear(c_, c2)

    def forward(self, x):
        return self.linear(self.pool(self.conv(x)).flatten(1))


class TorchYOLO11(nn.Module):
    """Full DAG executor over spec.layers with ultralytics-style `model.<i>` naming."""

    def __init__(self, spec: ModelSpec):
        super().__init__()
        self.spec = spec
        layers = []
        for layer in spec.layers:
            t = layer.typ
            if t == "Conv":
                m = TConv(layer.c_in, layer.c_out, layer.kw["k"], layer.kw["stride"])
            elif t == "C3k2":
                m = TC3k2(layer.c_in, layer.c_out, layer.kw["n"], layer.kw["c3k"], layer.kw["e"])
            elif t == "SPPF":
                m = TSPPF(layer.c_in, layer.c_out, layer.kw["k"])
            elif t == "C2PSA":
                m = TC2PSA(layer.c_in, layer.kw["n"])
            elif t == "Upsample":
                m = nn.Upsample(scale_factor=2, mode="nearest")
            elif t == "Concat":
                m = nn.Identity()
            elif t == "Detect":
                m = TDetect(spec.nc, layer.c_in, spec.reg_max)
            elif t == "Segment":
                m = TSegment(spec.nc, layer.c_in, spec.nm, spec.reg_max)
            elif t == "Pose":
                m = TPose(spec.nc, layer.c_in, spec.kpt_shape[0] * spec.kpt_shape[1], spec.reg_max)
            elif t == "OBB":
                m = TOBB(spec.nc, layer.c_in, spec.ne, spec.reg_max)
            elif t == "Classify":
                m = TClassify(layer.c_in, spec.nc, layer.kw.get("c_hidden", 1280))
            else:
                raise NotImplementedError(t)
            layers.append(m)
        self.model = nn.Sequential(*layers)
        self.names = {i: f"c{i}" for i in range(spec.nc)}

    @torch.no_grad()
    def forward(self, x):
        """x: NCHW. Returns the per-level head maps (NCHW)."""
        ys = {}
        prev = x
        for layer in self.spec.layers:
            m = self.model[layer.idx]
            if isinstance(layer.frm, tuple):
                inp = [prev if f == layer.idx - 1 else ys[f] for f in layer.frm]
            else:
                inp = prev if (layer.frm == layer.idx - 1 or layer.idx == 0) else ys[layer.frm]
            if layer.typ == "Concat":
                y = torch.cat(inp, 1)
            elif layer.typ in ("Detect", "Segment", "Pose", "OBB"):
                return m(inp)
            else:
                y = m(inp)
            prev = y
            ys[layer.idx] = y
        return prev
