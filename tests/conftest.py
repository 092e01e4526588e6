"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

This is the TPU answer to testing distributed code without a cluster
(SURVEY.md §4): all tests run on CPU with 8 virtual devices so sharding /
pjit paths are exercised for real, deterministically, and fast.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# jax may be pre-imported by a site hook with a different platform — override
# via config (backends initialize lazily, so this works post-import).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# persistent compile cache: repeated test runs skip XLA recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session")
def tiny_detect_model(rng):
    """yolo11n detect params/state/spec — shared across tests (builds once)."""
    from yolo_infer_tpu.models import build_model

    return build_model(rng, "detect", "n")


@pytest.fixture(scope="session")
def tiny_deploy(tiny_detect_model):
    from yolo_infer_tpu.models import fold_model

    params, state, spec = tiny_detect_model
    return fold_model(params, state), spec
