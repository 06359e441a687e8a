"""Profiling / observability utilities.

The reference has no tracing beyond wall-clock prints and an allocated
bytes counter (SURVEY.md §5).  The TPU build does better with
first-class hooks over jax.profiler:

  * ``trace(dir)``      — context manager capturing a TensorBoard/XProf
                          trace of everything inside.
  * ``Timer``           — device-synchronized wall-clock timing.
  * ``device_memory_stats`` — live HBM usage per device (the analog of
                          total_n_bytes_allocated, gpu_memory.h:53-56).
  * ``log``             — framework-wide logging with severities
                          (replaces the log-callback system,
                          common_host.h:46-69).
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Any, Dict, Optional

import jax

log = logging.getLogger("tcnn_tpu")


def set_verbose(verbose: bool = True) -> None:
    """≈ tcnn::set_verbose (common_host.h)."""
    log.setLevel(logging.DEBUG if verbose else logging.WARNING)
    if not log.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("[tcnn_tpu] %(levelname)s: %(message)s"))
        log.addHandler(h)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tcnn_tpu_trace"):
    """Capture an XProf trace (view with TensorBoard or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Device-synchronized timer: ``with Timer() as t: ...`` then
    ``t.seconds``.  Synchronizes all devices on exit so async dispatch
    doesn't fake speed."""

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        for d in jax.local_devices():
            try:
                d.synchronize_all_activity()  # type: ignore[attr-defined]
            except Exception:
                pass
        # Fallback: a tiny blocking op per backend.
        jax.block_until_ready(jax.numpy.zeros(()))
        self.seconds = time.perf_counter() - self._t0
        return False


def device_memory_stats(device: Optional[Any] = None) -> Dict[str, int]:
    """Bytes in use / limits for a device, when the backend reports them."""
    d = device or jax.local_devices()[0]
    try:
        stats = d.memory_stats()
        return dict(stats) if stats else {}
    except Exception:
        return {}


def throughput(n_samples: int, seconds: float) -> float:
    return n_samples / max(seconds, 1e-12)
