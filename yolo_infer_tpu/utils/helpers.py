"""General utilities: config, logging, timing, device info, resource monitor.

API-parity port of the reference's utils/helpers.py surface
(load_config/save_config helpers.py:145-200, setup_logging :236-279,
Timer :282-319, ProgressTracker :322-362, merge_configs :392-423,
get_device_info :21-66, ResourceMonitor :715-833) redesigned for a JAX/TPU
runtime: device probing goes through `jax.devices()`, timers synchronize via
`jax.block_until_ready` (the reference never synced its CUDA timers —
SURVEY.md §5 "Tracing/profiling").
"""

from __future__ import annotations

import json
import logging
import os
import platform
import threading
import time
from datetime import datetime
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Device / system info
# ---------------------------------------------------------------------------

def get_device_info() -> Dict[str, Any]:
    """Probe platform + accelerator devices (TPU via JAX)."""
    import psutil

    info: Dict[str, Any] = {
        "platform": platform.platform(),
        "python_version": platform.python_version(),
        "cpu_count": os.cpu_count(),
        "memory_total_gb": round(psutil.virtual_memory().total / 1e9, 2),
        "memory_available_gb": round(psutil.virtual_memory().available / 1e9, 2),
    }
    try:
        import jax

        devices = jax.devices()
        info["jax_version"] = jax.__version__
        info["default_backend"] = jax.default_backend()
        info["device_count"] = len(devices)
        info["devices"] = [
            {"id": d.id, "kind": d.device_kind, "platform": d.platform, "process": d.process_index}
            for d in devices
        ]
        info["tpu_available"] = any("tpu" in d.platform.lower() or "TPU" in d.device_kind for d in devices)
        mem = _device_memory_stats()
        if mem:
            info["device_memory"] = mem
        # in-process duty cycle floor (instrumented regions; see DeviceDutyTracker)
        info["device_busy_s"] = round(DEVICE_DUTY.snapshot(), 3)
        info["device_busy_events"] = DEVICE_DUTY.events
    except Exception as e:  # pragma: no cover
        info["jax_error"] = str(e)
    return info


class DeviceDutyTracker:
    """Steps/s-derived device occupancy (VERDICT r2 #8).

    The axon tunnel exposes no hardware utilization counter (the reference
    sampled GPU load via GPUtil, reference utils/helpers.py:744-776), so duty
    cycle is DERIVED: instrumented device regions (predict sync windows,
    benchmark windows, train steps, val inference) record their wall time
    here, and ResourceMonitor reports busy-time / wall-time per sample
    interval. Untracked device work undercounts — the number is a floor."""

    def __init__(self):
        self._lock = threading.Lock()
        self.busy_s = 0.0
        self.events = 0

    def record(self, seconds: float) -> None:
        with self._lock:
            self.busy_s += max(float(seconds), 0.0)
            self.events += 1

    def snapshot(self) -> float:
        with self._lock:
            return self.busy_s


DEVICE_DUTY = DeviceDutyTracker()


class device_busy:
    """Context manager marking a wall-clock window as device-busy."""

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        DEVICE_DUTY.record(time.perf_counter() - self._t0)
        return False


def _device_memory_stats() -> Dict[str, float]:
    """Accelerator memory telemetry via device.memory_stats() (the TPU analog
    of the reference's GPUtil sampling, reference utils/helpers.py:715-833).
    Returns {} where the backend doesn't expose stats (CPU, some tunnels)."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        if not stats:
            return {}
        out: Dict[str, float] = {}
        if "bytes_in_use" in stats:
            out["device_mem_used_gb"] = round(stats["bytes_in_use"] / 1e9, 3)
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        if limit:
            out["device_mem_limit_gb"] = round(limit / 1e9, 3)
            if "bytes_in_use" in stats:
                out["device_mem_percent"] = round(100.0 * stats["bytes_in_use"] / limit, 1)
        if "peak_bytes_in_use" in stats:
            out["device_mem_peak_gb"] = round(stats["peak_bytes_in_use"] / 1e9, 3)
        return out
    except Exception:  # noqa: BLE001 — telemetry must never break the caller
        return {}


def get_system_info() -> Dict[str, Any]:
    import psutil

    vm = psutil.virtual_memory()
    return {
        "timestamp": datetime.now().isoformat(),
        "cpu_percent": psutil.cpu_percent(),
        "memory_percent": vm.percent,
        "memory_used_gb": round(vm.used / 1e9, 2),
        "disk_usage_percent": psutil.disk_usage("/").percent,
        **get_device_info(),
    }


def calculate_model_size(params: Any) -> Dict[str, float]:
    """Parameter count + bytes of a params pytree."""
    import jax
    import numpy as np

    leaves = jax.tree_util.tree_leaves(params)
    n_params = sum(int(np.prod(x.shape)) for x in leaves)
    n_bytes = sum(int(np.prod(x.shape)) * x.dtype.itemsize for x in leaves)
    return {
        "parameters": n_params,
        "size_mb": round(n_bytes / (1024 * 1024), 3),
        "size_bytes": n_bytes,
    }


# ---------------------------------------------------------------------------
# Formatting
# ---------------------------------------------------------------------------

def format_time(seconds: float) -> str:
    if seconds < 1e-3:
        return f"{seconds * 1e6:.1f}us"
    if seconds < 1:
        return f"{seconds * 1e3:.1f}ms"
    if seconds < 60:
        return f"{seconds:.2f}s"
    if seconds < 3600:
        m, s = divmod(seconds, 60)
        return f"{int(m)}m{s:.0f}s"
    h, rem = divmod(seconds, 3600)
    m = rem // 60
    return f"{int(h)}h{int(m)}m"


def format_bytes(n: float) -> str:
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if abs(n) < 1024:
            return f"{n:.1f}{unit}"
        n /= 1024
    return f"{n:.1f}PB"


# ---------------------------------------------------------------------------
# Config system (YAML/JSON + deep merge; reference helpers.py:145-200,392-423)
# ---------------------------------------------------------------------------

def load_config(path: Union[str, Path]) -> Dict[str, Any]:
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"config not found: {path}")
    text = path.read_text()
    if path.suffix in (".yaml", ".yml"):
        import yaml

        return yaml.safe_load(text) or {}
    if path.suffix == ".json":
        return json.loads(text)
    raise ValueError(f"unsupported config format: {path.suffix}")


def save_config(config: Dict[str, Any], path: Union[str, Path]) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if path.suffix in (".yaml", ".yml"):
        import yaml

        path.write_text(yaml.safe_dump(config, sort_keys=False))
    elif path.suffix == ".json":
        path.write_text(json.dumps(config, indent=2, default=str))
    else:
        raise ValueError(f"unsupported config format: {path.suffix}")


def merge_configs(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    """Deep merge: override wins; nested dicts merge recursively."""
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_configs(out[k], v)
        else:
            out[k] = v
    return out


def create_experiment_dir(base_dir: Union[str, Path], name: str = "exp") -> Path:
    stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    path = Path(base_dir) / f"{name}_{stamp}"
    path.mkdir(parents=True, exist_ok=True)
    return path


# ---------------------------------------------------------------------------
# Logging
# ---------------------------------------------------------------------------

def setup_logging(level: str = "INFO", log_file: Optional[Union[str, Path]] = None, name: Optional[str] = None) -> logging.Logger:
    lg = logging.getLogger(name) if name else logging.getLogger()
    lg.setLevel(getattr(logging, level.upper(), logging.INFO))
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    if not any(isinstance(h, logging.StreamHandler) and not isinstance(h, logging.FileHandler) for h in lg.handlers):
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        lg.addHandler(sh)
    if log_file:
        Path(log_file).parent.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        lg.addHandler(fh)
    return lg


# ---------------------------------------------------------------------------
# Timing
# ---------------------------------------------------------------------------

def device_sync(tree: Any) -> None:
    """Force completion of device work backing `tree`.

    `jax.block_until_ready` alone is not sufficient through remote-TPU
    tunnels; a tiny device->host transfer of one element per leaf-group is
    the reliable barrier.
    """
    import jax
    import numpy as np

    jax.block_until_ready(tree)
    leaves = [x for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "dtype")]
    if leaves:
        np.asarray(leaves[0].ravel()[:1])


class Timer:
    """Context-manager wall timer that synchronizes device work.

    Unlike the reference's Timer (helpers.py:282-319) this forces real device
    completion for anything passed via `sync` (see device_sync), so TPU
    latencies are real even over remote runtimes.
    """

    def __init__(self, name: str = "", sync: Any = None, verbose: bool = False):
        self.name = name
        self.sync = sync
        self.verbose = verbose
        self.elapsed = 0.0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync is not None:
            device_sync(self.sync)
        self.elapsed = time.perf_counter() - self.start
        if self.verbose:
            logger.info("%s took %s", self.name or "block", format_time(self.elapsed))
        return False


class ProgressTracker:
    """Simple ETA tracker (reference helpers.py:322-362)."""

    def __init__(self, total: int, name: str = ""):
        self.total = total
        self.name = name
        self.count = 0
        self.start = time.perf_counter()

    def update(self, n: int = 1) -> Dict[str, float]:
        self.count += n
        elapsed = time.perf_counter() - self.start
        rate = self.count / elapsed if elapsed > 0 else 0.0
        remaining = (self.total - self.count) / rate if rate > 0 else float("inf")
        return {"count": self.count, "total": self.total, "rate": rate, "eta_s": remaining, "elapsed_s": elapsed}


# ---------------------------------------------------------------------------
# Resource monitor (daemon-thread sampler; reference helpers.py:715-833)
# ---------------------------------------------------------------------------

class ResourceMonitor:
    """Background CPU/memory/accelerator sampler with a bounded ring buffer.

    Samples host CPU/memory plus device memory when the backend exposes
    `memory_stats()` — the TPU equivalent of the reference's GPU
    utilization/memory sampling (reference utils/helpers.py:715-833)."""

    def __init__(self, interval: float = 1.0, max_points: int = 1000, sample_device: bool = True):
        self.interval = interval
        self.max_points = max_points
        self.history: List[Dict[str, float]] = []
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        # probe once: if the backend has no memory_stats, skip per-sample cost
        self._device = bool(sample_device and _device_memory_stats())
        self._last_busy = DEVICE_DUTY.snapshot()
        self._last_t = time.perf_counter()

    def _sample(self) -> Dict[str, float]:
        import psutil

        vm = psutil.virtual_memory()
        out = {
            "t": time.time(),
            "cpu_percent": psutil.cpu_percent(),
            "memory_percent": vm.percent,
            "memory_used_gb": vm.used / 1e9,
        }
        # duty cycle from instrumented device regions (DeviceDutyTracker):
        # busy wall time since the last sample / interval, capped at 100
        now = time.perf_counter()
        busy = DEVICE_DUTY.snapshot()
        dt = max(now - self._last_t, 1e-9)
        out["device_util_percent"] = round(min((busy - self._last_busy) / dt, 1.0) * 100.0, 1)
        self._last_busy, self._last_t = busy, now
        if self._device:
            out.update(_device_memory_stats())
        return out

    def _loop(self):
        while not self._stop.is_set():
            self.history.append(self._sample())
            if len(self.history) > self.max_points:
                self.history = self.history[-self.max_points :]
            self._stop.wait(self.interval)

    def start(self):
        self._stop.clear()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> Dict[str, Any]:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self.interval * 2 + 1)
        return self.summary()

    def summary(self) -> Dict[str, Any]:
        if not self.history:
            return {}
        keys = ["cpu_percent", "memory_percent", "memory_used_gb", "device_util_percent"]
        if self._device:
            keys += [k for k in ("device_mem_used_gb", "device_mem_percent", "device_mem_peak_gb") if k in self.history[-1]]
        present = [h for h in self.history]
        return {
            f"avg_{k}": sum(h.get(k, 0.0) for h in present) / len(present) for k in keys
        } | {f"max_{k}": max(h.get(k, 0.0) for h in present) for k in keys} | {"samples": len(present)}

    def save(self, path: Union[str, Path]):
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_text(json.dumps({"history": self.history, "summary": self.summary()}, indent=2))


# ---------------------------------------------------------------------------
# File utilities (reference helpers.py:426-646) + model path validation (:365-389)
# ---------------------------------------------------------------------------

def get_file_hash(path: Union[str, Path], algorithm: str = "md5", chunk: int = 1 << 20) -> str:
    import hashlib

    h = hashlib.new(algorithm)
    with open(path, "rb") as f:
        while True:
            data = f.read(chunk)
            if not data:
                break
            h.update(data)
    return h.hexdigest()


def compare_files(a: Union[str, Path], b: Union[str, Path]) -> bool:
    pa, pb = Path(a), Path(b)
    if pa.stat().st_size != pb.stat().st_size:
        return False
    return get_file_hash(pa) == get_file_hash(pb)


def backup_file(path: Union[str, Path], backup_dir: Optional[Union[str, Path]] = None) -> Path:
    import shutil

    src = Path(path)
    stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    dst_dir = Path(backup_dir) if backup_dir else src.parent / "backups"
    dst_dir.mkdir(parents=True, exist_ok=True)
    dst = dst_dir / f"{src.stem}_{stamp}{src.suffix}"
    shutil.copy2(src, dst)
    return dst


def clean_old_files(directory: Union[str, Path], pattern: str = "*", keep_last: int = 5) -> List[Path]:
    files = sorted(Path(directory).glob(pattern), key=lambda p: p.stat().st_mtime)
    removed = files[: max(len(files) - keep_last, 0)]
    for f in removed:
        f.unlink(missing_ok=True)
    return removed


def download_file(url: str, dest: Union[str, Path], timeout: float = 30.0) -> Path:
    """Download a file (reference helpers.py file-utils surface). In
    air-gapped/zero-egress deployments this raises with a clear message."""
    import urllib.error
    import urllib.request

    dest = Path(dest)
    dest.parent.mkdir(parents=True, exist_ok=True)
    try:
        with urllib.request.urlopen(url, timeout=timeout) as r, open(dest, "wb") as f:
            f.write(r.read())
    except (urllib.error.URLError, OSError) as e:
        raise RuntimeError(f"download failed (offline environment?): {url} -> {e}") from e
    return dest


def validate_model_path(path: Union[str, Path]) -> bool:
    """True if `path` is a loadable model reference (file or yolo11* name)."""
    p = Path(path)
    if p.exists():
        return p.suffix in (".msgpack", ".ckpt", ".pt", ".safetensors")
    from yolo_infer_tpu.core.model import parse_model_name

    return parse_model_name(str(path)) is not None


def check_dependencies() -> Dict[str, bool]:
    out = {}
    for mod in ("jax", "flax", "optax", "numpy", "cv2", "yaml", "psutil", "PIL"):
        try:
            __import__(mod)
            out[mod] = True
        except ImportError:
            out[mod] = False
    return out
