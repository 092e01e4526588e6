"""Persistent XLA compilation-cache wiring for the library (VERDICT r2 #7).

Remote-TPU compiles cost 10-90 s per (shape, fn) signature; the reference's
eager-torch cold start is effectively instant. JAX's persistent compilation
cache closes most of the gap: the second process to compile an identical
program loads it from disk instead. This module turns the cache on for
library entry points (YOLO11Model / Predictor / bench.py / main.py).

Policy:
* honors an ALREADY-configured ``jax_compilation_cache_dir`` (e.g. the test
  conftest) — never overrides;
* ``YOLO_TPU_COMPILE_CACHE=0`` opts out, ``YOLO_TPU_COMPILE_CACHE=<dir>``
  picks the directory, default ``~/.cache/yolo_infer_tpu/xla_cache``;
* failures are logged and ignored — the cache is an optimization, never a
  correctness dependency.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

DEFAULT_CACHE_DIR = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")), "yolo_infer_tpu", "xla_cache"
)
_done = False


def enable_compile_cache(path: Optional[str] = None) -> Optional[str]:
    """Idempotently enable the persistent compile cache. Returns the active
    cache dir (which may be one configured elsewhere), or None if disabled."""
    global _done
    env = os.environ.get("YOLO_TPU_COMPILE_CACHE", "")
    if env == "0":
        return None
    try:
        import jax

        current = jax.config.jax_compilation_cache_dir
        if current:  # already configured (tests, user) — respect it
            _done = True
            return current
        if _done:
            return jax.config.jax_compilation_cache_dir
        path = path or (env if env not in ("", "1") else None) or DEFAULT_CACHE_DIR
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took meaningful compile time (default 1 s
        # threshold skips the trivial programs that would bloat the dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _done = True
        logger.debug("persistent XLA compile cache at %s", path)
        return path
    except Exception as e:  # noqa: BLE001 — never let the cache break inference
        logger.warning("could not enable the persistent compile cache: %s", e)
        return None
