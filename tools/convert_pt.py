#!/usr/bin/env python
"""One-time ultralytics `.pt` -> native msgpack converter (CLI).

Works without the ultralytics package installed (permissive unpickling +
structural module-tree walk; see yolo_infer_tpu/models/convert.py).

After converting, the tool validates the round trip (unless --no-verify):
  * every parameter leaf of the saved file is compared against the in-memory
    converted tree (per-layer max-abs-diff report);
  * a forward pass of the .pt-loaded model and the .msgpack-loaded model on
    the same random image must agree.

Usage:
  python tools/convert_pt.py yolo11n.pt              # -> yolo11n.msgpack
  python tools/convert_pt.py yolo11n.pt out.msgpack
  python tools/convert_pt.py --no-verify yolo11n.pt
"""

import sys


def _flat_leaves(tree, prefix=""):
    import numpy as np

    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flat_leaves(v, f"{prefix}{k}.")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _flat_leaves(v, f"{prefix}{i}.")
    elif hasattr(tree, "shape"):
        yield prefix.rstrip("."), np.asarray(tree)


def verify_roundtrip(src, out) -> int:
    """Compare saved-file params vs in-memory conversion + forward parity."""
    import numpy as np

    import jax.numpy as jnp

    from yolo_infer_tpu.core.model import YOLO11Model
    from yolo_infer_tpu.models.convert import convert_pt_checkpoint

    params, meta = convert_pt_checkpoint(src)
    loaded = YOLO11Model(out, compute_dtype=jnp.float32)

    a = dict(_flat_leaves(params))
    b = dict(_flat_leaves(loaded.params))
    worst = []
    n_checked = 0
    for name, arr in a.items():
        if name not in b:
            print(f"  MISSING in saved file: {name}")
            continue
        if arr.shape != b[name].shape:
            print(f"  SHAPE MISMATCH {name}: {arr.shape} vs {b[name].shape}")
            continue
        diff = float(np.abs(arr.astype(np.float32) - b[name].astype(np.float32)).max())
        worst.append((diff, name))
        n_checked += 1
    worst.sort(reverse=True)
    print(f"verified {n_checked} parameter tensors; worst per-layer max-abs-diff:")
    for diff, name in worst[:5]:
        print(f"  {diff:.3e}  {name}")
    bad = [w for w in worst if w[0] > 1e-5]

    # forward parity: .pt-loaded vs .msgpack-loaded on the same input
    src_model = YOLO11Model(src, compute_dtype=jnp.float32)
    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    ra = src_model.predict(img, conf=0.0001, imgsz=64)[0]
    rb = loaded.predict(img, conf=0.0001, imgsz=64)[0]
    fwd_ok = len(ra) == len(rb) and (
        len(ra) == 0 or np.allclose(ra.scores, rb.scores, atol=1e-4)
    )
    print(f"forward parity (.pt vs .msgpack): {'OK' if fwd_ok else 'MISMATCH'}")
    if bad or not fwd_ok:
        print(f"ROUND-TRIP VALIDATION FAILED ({len(bad)} tensors over tolerance)")
        return 1
    print("round-trip validation OK")
    return 0


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    verify = "--no-verify" not in sys.argv
    if not args:
        print(__doc__)
        return 2
    src = args[0]
    dst = args[1] if len(args) > 1 else None

    from yolo_infer_tpu.models.convert import convert_to_file

    out = convert_to_file(src, dst)
    print(f"converted {src} -> {out}")
    if verify:
        return verify_roundtrip(src, out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
