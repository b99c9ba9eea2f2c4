"""
Persistent XLA compilation cache.

The tunneled TPU backend can take minutes to compile the fused
analysis program (751 s observed for the full bench pipeline, round 3),
which a fresh process would pay again on every run. JAX's persistent
compilation cache keys compiled executables on the HLO + compile
options + backend, so a second process reuses the binaries from disk.

Enabled automatically at ``import amof_tpu`` (the reference has no
analogous cost: its native engines are precompiled binaries). Disable
with ``AMOF_TPU_NO_COMPILE_CACHE=1``; relocate with
``AMOF_TPU_COMPILE_CACHE=/path``.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_DEFAULT_DIR = os.path.expanduser("~/.cache/amof_tpu/xla_cache")


def _host_fingerprint() -> str:
    """Short stable id of this host's CPU feature set."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(feats.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return platform.machine() or "unknown"


def _platform_tag() -> str:
    """Short id of this process's jax platform configuration.

    Distinct platform configs produce incompatible XLA:CPU AOT entries
    on the SAME host: a TPU-attached process writes CPU sub-programs
    compiled with +prefer-no-scatter/+prefer-no-gather features that a
    plain-CPU process then rejects at load time with an error-level log
    per entry (observed live, round 4). The platform is decided by
    JAX_PLATFORMS / the axon pool env before backend init, so key on
    those rather than initializing a backend just to ask.
    """
    plat = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if not plat:
        plat = "axon" if os.environ.get("PALLAS_AXON_POOL_IPS") else "auto"
    return "".join(c if c.isalnum() else "-" for c in plat) or "auto"


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point jax at a persistent on-disk compilation cache.

    Returns the cache directory, or None when disabled/unsupported.
    Safe to call repeatedly and before/after backend initialization
    (the config flags apply to subsequent compilations).
    """
    if os.environ.get("AMOF_TPU_NO_COMPILE_CACHE"):
        return None
    path = path or os.environ.get("AMOF_TPU_COMPILE_CACHE") or _DEFAULT_DIR
    # Partition by host fingerprint: XLA:CPU entries AOT-compiled on a
    # machine with different CPU features are rejected at load time
    # with an error-level log PER ENTRY (observed when the cache dir is
    # shared via a network home between the bench host and this one).
    # TPU entries are keyed on the accelerator, not the host, but they
    # share the directory with the CPU sub-programs of the same run,
    # so fingerprint unconditionally. Additionally partition by the jax
    # platform config: TPU-attached and plain-CPU processes on the SAME
    # host emit mutually incompatible XLA:CPU AOT entries (_platform_tag).
    tag = _platform_tag()
    path = os.path.join(path, _host_fingerprint() + "-" + tag)
    # XLA:CPU embeds an AOT codegen result in every serialized
    # executable and, on load, compares the compile-time LLVM feature
    # string (which includes tuning pseudo-features like
    # +prefer-no-scatter) against raw host cpuid features — an
    # unconditional error-level log per entry even when the entry was
    # written by this very host and platform, with no XLA flag to gate
    # it (verified against jaxlib 0.9.0). The load still succeeds and
    # warm runs are ~2x faster, so keep the cache and silence C++
    # non-fatal logs on plain-CPU processes only (TPU runs keep full
    # diagnostics). Opt out by setting TF_CPP_MIN_LOG_LEVEL yourself.
    if tag == "cpu" and "TF_CPP_MIN_LOG_LEVEL" not in os.environ:
        os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"
    try:
        os.makedirs(path, exist_ok=True)
    except OSError as e:  # read-only home etc. — cache is best-effort
        logger.debug("compilation cache dir unavailable: %s", e)
        return None
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # default min compile time is 1 s; the fused pipeline's many
        # sub-programs (pore stages, chunked dispatches) each sit well
        # above that, but cache the small ones too so a warm start
        # replays the whole program set
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # noqa: BLE001 — option absent in this jax
        logger.debug("compilation cache unsupported: %s", e)
        return None
    return path
