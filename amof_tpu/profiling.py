"""
Profiling and observability subsystem.

The reference has none (SURVEY.md §5.1 — only stale timing remarks in
comments). This module provides:

  * ``trace(logdir)``: context manager around ``jax.profiler`` traces
    (TensorBoard-compatible) for the device kernels;
  * ``timed(name)``: wall-clock section timing with a process-global
    registry, safe around async dispatch (forces a sync);
  * ``timings()`` / ``reset_timings()``: structured access, the runtime
    analog of the reference's report_search bookkeeping.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, List

logger = logging.getLogger(__name__)

_TIMINGS: Dict[str, List[float]] = defaultdict(list)


@contextlib.contextmanager
def trace(logdir, create_perfetto_link: bool = False):
    """Capture a jax profiler trace of the enclosed block."""
    import jax

    jax.profiler.start_trace(str(logdir),
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(name: str, sync: bool = True):
    """Time a section; with sync=True, waits for outstanding device work
    before stopping the clock (async dispatch otherwise lies)."""
    start = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            try:
                import jax

                jax.effects_barrier()
            except Exception:  # noqa: BLE001 — profiling must not raise
                pass
        elapsed = time.perf_counter() - start
        _TIMINGS[name].append(elapsed)
        logger.debug("timed[%s] = %.4fs", name, elapsed)


def timings() -> Dict[str, Dict[str, float]]:
    """{section: {count, total, mean, min, max}} of all timed blocks."""
    out = {}
    for name, values in _TIMINGS.items():
        out[name] = {
            "count": len(values),
            "total": sum(values),
            "mean": sum(values) / len(values),
            "min": min(values),
            "max": max(values),
        }
    return out


def reset_timings():
    _TIMINGS.clear()


def device_memory_stats():
    """Per-device memory stats where the backend exposes them."""
    import jax

    stats = {}
    for d in jax.devices():
        try:
            stats[str(d)] = d.memory_stats()
        except Exception:  # noqa: BLE001 — optional backend feature
            stats[str(d)] = None
    return stats
