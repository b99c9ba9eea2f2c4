"""
Host-side frame parallelism for analyses whose per-frame work stays on
the host (ring census, building-unit reduction).

The reference fans these out with joblib process pools — call sites
amof/ring/core.py:121-131 and amof/coordination/reduce.py:113-117, with
the worker heuristic max(cpu_count()//2 - 2, 2) from amof/cn.py:79.
The rebuild's device analyses replace joblib with SPMD meshes, but the
host-side analyses still need a pool:

  * ring census: the hot loop is the C++ enumerator called through
    ctypes, which releases the GIL — threads give real parallelism with
    zero pickling cost;
  * reduction rule programs: pure Python, so threads only interleave;
    loky/joblib processes (cloudpickle handles the closure-style
    reducers) when available, threads otherwise.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, List


def default_n_workers() -> int:
    """The reference's worker heuristic (amof/cn.py:79)."""
    return max((os.cpu_count() or 1) // 2 - 2, 2)


def resolve_n_workers(parallel, n_items: int) -> int:
    """Reference semantics: False -> 1, True -> heuristic, int -> that
    many; always capped at the number of items."""
    if parallel is True:
        n = default_n_workers()
    elif parallel is False or parallel is None:
        n = 1
    else:
        n = int(parallel)
    return max(1, min(n, n_items))


def parallel_map(
    fn: Callable, items: Iterable, parallel, prefer: str = "threads"
) -> List:
    """Order-preserving map over frames with the reference's
    ``parallel`` argument semantics.

    Args:
        prefer: "threads" for GIL-releasing work (ctypes/numpy),
            "processes" for pure-Python work (uses joblib/loky when
            importable, falls back to threads).
    """
    items = list(items)
    n = resolve_n_workers(parallel, len(items))
    if n <= 1:
        return [fn(x) for x in items]
    if prefer == "processes":
        try:
            from joblib import Parallel, delayed

            return Parallel(n_jobs=n)(delayed(fn)(x) for x in items)
        except ImportError:
            pass
    with ThreadPoolExecutor(max_workers=n) as pool:
        return list(pool.map(fn, items))
