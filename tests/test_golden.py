"""Golden-activation fixtures: JAX forward vs recorded torch outputs.

Each committed tests/golden/*.npz pins the torch-reference forward of one
task's nano model on a deterministic input (generated once by
tools/make_golden.py). At test time the torch state dict is regenerated from
the (name, shape) manifest — no torch import — pushed through the REAL
converter name-mapping (models/convert.convert_state_dict), and the JAX
forward must reproduce the recorded activations. This pins conversion
fidelity and forward numerics in a committed artifact instead of re-deriving
both sides from the same code each run (VERDICT r2 next-step 1b; SURVEY §7
hard part 2/6)."""

from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from golden_common import GOLDEN_VERSION, golden_state_dict, unpack_manifest

from yolo_infer_tpu.models import build_spec, forward
from yolo_infer_tpu.models.convert import convert_state_dict, infer_model_meta

GOLDEN_DIR = Path(__file__).parent / "golden"
TASKS = ["detect", "segment", "classify", "pose", "obb"]

_EXTRA_KEYS = {"detect": (), "segment": ("mc", "proto"), "pose": ("kpts",), "obb": ("angle",), "classify": ()}


@pytest.mark.parametrize("task", TASKS)
def test_golden_forward_parity(task):
    path = GOLDEN_DIR / f"golden_{task}_n_v{GOLDEN_VERSION}.npz"
    assert path.exists(), f"missing fixture {path} — run tools/make_golden.py"
    z = np.load(path)
    assert int(z["version"]) == GOLDEN_VERSION

    names = str(z["names"]).split("\n")
    shapes = unpack_manifest(z["shapes_flat"], z["shapes_ndims"])
    sd = golden_state_dict(names, shapes)

    # the manifest also validates meta inference from shapes alone
    meta = infer_model_meta(sd)
    assert meta["task"] == task and meta["size"] == "n" and meta["nc"] == int(z["nc"])

    spec = build_spec(task, "n", nc=int(z["nc"]))
    params, state = convert_state_dict(sd, spec)
    out, _ = forward(params, state, spec, jnp.asarray(z["input"]), compute_dtype=jnp.float32)

    def close(key, got):
        want = z[key]
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3, err_msg=key)

    if task == "classify":
        close("out_logits", out["logits"])
        return
    for i, f in enumerate(out["feats"]):
        close(f"out_feat{i}", f)
    for key in _EXTRA_KEYS[task]:
        if key == "proto":
            close("out_proto", out["proto"])
        else:
            for i, f in enumerate(out[key]):
                close(f"out_{key}{i}", f)


def test_golden_fixture_is_sensitive():
    """A perturbed weight must break parity — guards against a fixture that
    vacuously passes (e.g. comparing zeros to zeros)."""
    path = GOLDEN_DIR / f"golden_detect_n_v{GOLDEN_VERSION}.npz"
    z = np.load(path)
    names = str(z["names"]).split("\n")
    shapes = unpack_manifest(z["shapes_flat"], z["shapes_ndims"])
    sd = golden_state_dict(names, shapes)
    sd["model.0.conv.weight"] = sd["model.0.conv.weight"] + 1e-2  # stem nudge
    spec = build_spec("detect", "n", nc=int(z["nc"]))
    params, state = convert_state_dict(sd, spec)
    out, _ = forward(params, state, spec, jnp.asarray(z["input"]), compute_dtype=jnp.float32)
    delta = float(np.abs(np.asarray(out["feats"][0]) - z["out_feat0"]).max())
    assert delta > 2e-4, f"fixture not sensitive to weight perturbation (delta={delta})"
