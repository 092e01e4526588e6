#!/usr/bin/env python
"""Generate the committed golden-activation fixtures (tests/golden/*.npz).

Run ONCE per GOLDEN_VERSION (torch required): for each task, builds the
independent torch implementation of the nano spec (tests/torch_ref.py), loads
deterministic name-seeded weights (tests/golden_common.py), records its
forward outputs on a deterministic input, and writes a tiny npz holding only
{manifest, input, outputs} — the weights are regenerable from the manifest,
so the fixture pins torch-vs-JAX parity WITHOUT committing megabytes of
parameters and WITHOUT needing torch at test time (VERDICT r2 next-step 1b).

Usage: python tools/make_golden.py [outdir=tests/golden]
"""

import sys
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from golden_common import GOLDEN_VERSION, golden_input, golden_state_dict, pack_manifest
from torch_ref import TorchYOLO11

from yolo_infer_tpu.models.spec import build_spec

TASKS = ["detect", "segment", "classify", "pose", "obb"]
NC = 5
HW = 96


def make_fixture(task: str, outdir: Path) -> Path:
    spec = build_spec(task, "n", nc=NC)
    model = TorchYOLO11(spec).eval()
    names, shapes = zip(*[(k, tuple(v.shape)) for k, v in model.state_dict().items()])
    sd = golden_state_dict(names, shapes)
    model.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})

    x = golden_input(HW)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        out = model(xt)

    arrays = {}
    if task == "classify":
        arrays["out_logits"] = out.numpy()
    else:
        feats, extras = out if isinstance(out, tuple) else (out, {})
        for i, f in enumerate(feats):
            arrays[f"out_feat{i}"] = f.numpy().transpose(0, 2, 3, 1)
        for key, val in extras.items():
            if isinstance(val, list):
                for i, f in enumerate(val):
                    arrays[f"out_{key}{i}"] = f.numpy().transpose(0, 2, 3, 1)
            else:
                arrays[f"out_{key}"] = val.numpy().transpose(0, 2, 3, 1)

    flat, ndims = pack_manifest(shapes)
    path = outdir / f"golden_{task}_n_v{GOLDEN_VERSION}.npz"
    np.savez_compressed(
        path,
        version=np.int64(GOLDEN_VERSION),
        task=np.str_(task),
        nc=np.int64(NC),
        hw=np.int64(HW),
        names=np.str_("\n".join(names)),
        shapes_flat=flat,
        shapes_ndims=ndims,
        input=x,
        **arrays,
    )
    print(f"{path}: {path.stat().st_size / 1024:.0f} KiB, {len(arrays)} output arrays")
    return path


def main():
    outdir = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(__file__).resolve().parent.parent / "tests" / "golden"
    outdir.mkdir(parents=True, exist_ok=True)
    for task in TASKS:
        make_fixture(task, outdir)


if __name__ == "__main__":
    main()
