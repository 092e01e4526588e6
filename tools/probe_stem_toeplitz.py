"""Probe: Toeplitz 3-GEMM formulation of conv0 (3->16, k3, s2) vs lax.conv.

MEASURED (v5e-1, b128): baseline (XLA conv, /255 fused) 5.23 ms;
Toeplitz total 25.3 ms — slab build (batch-into-lanes transpose) alone
5.45 ms, windowed gather + 3 einsums 20.9 ms. NEGATIVE RESULT: lane-dim
transposes are VPU-shuffle bound in XLA and dominate; XLA's own
InputFeaturePackedInputBatchInLanes emitter (which pays the same relayout
once, internally) is the practical floor for a C_in=3 conv. Kept as the
record for why no Pallas stem kernel exists (docs/ARCHITECTURE.md).

PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_stem_toeplitz.py

Layout plan (batch-in-lanes, q*B flat):
  slabs X[par] (1926, 322*B) bf16: rows (r_pad*3 + c), r_pad = r+1 in [0,642);
  cols (q_pad*B + b), q_pad = q+1 (even/odd W parity), zero-padded edges.
  W' (128, 51): rows (p_off*16 + o) for p_off in [0,8); cols (r_hat*3 + c),
  r_hat in [0,17) where r = 48*Pb/6... r_hat = r_pad - 16*Pb relates via
  row-window [16*Pb, 16*Pb+17). Nonzero iff di = r - 2p in {-1,0,1}.
  Three shifted dots (dj = -1, 0, +1 via even/odd slabs and B-lane offsets).
Out: y_t (40, 128, 320*B) -> logical (320p, 16o, 320q, B) -> transpose to NHWC.
"""
import time, json
import numpy as np
import jax, jax.numpy as jnp
from jax import lax


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def bench(fn, args, runs=20):
    out = fn(*args); sync(out)
    for _ in range(3): out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(runs): out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / runs * 1e3


B, H, W = 128, 640, 640
PR = 8                     # output rows per GEMM block
NB = (H // 2) // PR        # 40 blocks
rng = np.random.default_rng(0)
x_u8 = jnp.asarray(rng.integers(0, 255, (B, H, W, 3), dtype=np.uint8))
w0 = jnp.asarray(rng.standard_normal((3, 3, 3, 16)).astype(np.float32) * 0.1, jnp.bfloat16)


def baseline(x, w):
    xb = x.astype(jnp.bfloat16) / 255.0
    return lax.conv_general_dilated(xb, w, (2, 2), ((1, 1), (1, 1)),
                                    dimension_numbers=("NHWC", "HWIO", "NHWC"))


def build_slabs(x):
    # (B, H, W, 3) u8 -> two (3*(H+2), (W//2+2)*B) bf16 slabs, scaled 1/255
    xb = x.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 255.0)
    xt = jnp.transpose(xb, (1, 2, 3, 0))              # (H, W, 3, B)
    xt = jnp.pad(xt, ((1, 1), (0, 0), (0, 0), (0, 0)))  # row pad
    slabs = []
    for par in (0, 1):
        s = xt[:, par::2]                             # (H+2, W/2, 3, B)
        s = jnp.pad(s, ((0, 0), (1, 1), (0, 0), (0, 0)))  # q pad
        s = jnp.transpose(s, (0, 2, 1, 3))            # (H+2, 3, W/2+2, B)
        slabs.append(s.reshape(3 * (H + 2), (W // 2 + 2) * B))
    return slabs


def build_wprime(w):
    # w (3, 3, 3, 16) HWIO -> three (128, 51) Toeplitz mats, one per dj.
    # Traceable: static index/mask arrays gather from the (traced) weight.
    K = 2 * PR + 1
    rows, cols = PR * 16, K * 3
    p_off = np.arange(rows)[:, None] // 16
    o = np.arange(rows)[:, None] % 16
    r_hat = np.arange(cols)[None, :] // 3
    c = np.arange(cols)[None, :] % 3
    di = r_hat - 2 * p_off - 1
    mask = (np.abs(di) <= 1)
    di_idx = np.clip(di + 1, 0, 2)
    o_b = np.broadcast_to(o, (rows, cols))
    c_b = np.broadcast_to(c, (rows, cols))
    maskj = jnp.asarray(mask, jnp.bfloat16)
    out = []
    for dj in (-1, 0, 1):
        m = w[di_idx, dj + 1, c_b, o_b] * maskj
        out.append(m.astype(jnp.bfloat16))
    return out


def toeplitz_conv0(x, w):
    xe, xo = build_slabs(x)
    wm, w0_, wp = build_wprime(w)
    q_b = (W // 2) * B
    # windows: (NB, 51, cols) gathered from slab rows [48*Pb, 48*Pb+51)
    idx = (48 * jnp.arange(NB)[:, None] + jnp.arange(51)[None, :])  # (NB, 51)
    we = xe[idx]                                       # (NB, 51, 322B)
    wo = xo[idx]
    # dj=0 -> even cols q_pad=q+1; dj=-1 -> odd cols q_pad=q; dj=+1 -> odd q+1
    y = jnp.einsum("mk,bkn->bmn", w0_, we[:, :, B : B + q_b], preferred_element_type=jnp.float32)
    y += jnp.einsum("mk,bkn->bmn", wm, wo[:, :, 0:q_b], preferred_element_type=jnp.float32)
    y += jnp.einsum("mk,bkn->bmn", wp, wo[:, :, B : B + q_b], preferred_element_type=jnp.float32)
    # (NB, 128, q_b) -> (320p, 16o, 320q, B) -> NHWC
    y = y.reshape(NB, PR, 16, W // 2, B).reshape(H // 2, 16, W // 2, B)
    return jnp.transpose(y, (3, 0, 2, 1)).astype(jnp.bfloat16)  # (B, 320, 320, 16)


fb = jax.jit(baseline)
ft = jax.jit(toeplitz_conv0)
res = {}
yb = fb(x_u8, w0)
yt = ft(x_u8, w0)
res["maxdiff"] = float(jnp.max(jnp.abs(yb.astype(jnp.float32) - yt.astype(jnp.float32))))
res["baseline_ms"] = round(bench(fb, (x_u8, w0)), 3)
res["toeplitz_ms"] = round(bench(ft, (x_u8, w0)), 3)

# pieces
fs = jax.jit(lambda x: build_slabs(x)[0])
res["slabs_ms"] = round(bench(fs, (x_u8,)), 3)


def upto_y(x, w):
    xe, xo = build_slabs(x)
    wm, w0_, wp = build_wprime(w)
    q_b = (W // 2) * B
    idx = (48 * jnp.arange(NB)[:, None] + jnp.arange(51)[None, :])
    we, wo = xe[idx], xo[idx]
    y = jnp.einsum("mk,bkn->bmn", w0_, we[:, :, B : B + q_b], preferred_element_type=jnp.float32)
    y += jnp.einsum("mk,bkn->bmn", wm, wo[:, :, 0:q_b], preferred_element_type=jnp.float32)
    y += jnp.einsum("mk,bkn->bmn", wp, wo[:, :, B : B + q_b], preferred_element_type=jnp.float32)
    return y.astype(jnp.bfloat16)


res["upto_y_ms"] = round(bench(jax.jit(upto_y), (x_u8, w0)), 3)
print(json.dumps(res))
