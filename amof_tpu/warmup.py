"""
Asynchronous Mosaic-runtime warmup.

On the tunneled TPU backend used here, the FIRST execution of any
program containing a Mosaic (Pallas) custom call in a process pays a
large one-time initialization on the remote worker — measured 0.9-400 s
for an 8x128 copy kernel (scripts/probe_pallas_init.py), depending on
whether the device pool grants a worker that has already initialized
Mosaic. The cost is independent of kernel content: after the copy
kernel, the full production RDF kernel compiles and runs in ~2 s. The
persistent XLA cache (amof_tpu.cache) cannot remove it because it is
paid at program *load*, once per device grant, even for cache-hit
executables.

``warmup_mosaic()`` dispatches a trivial Pallas kernel WITHOUT blocking
on its result: JAX/PJRT execution is asynchronous, so the remote worker
starts its Mosaic init immediately while the caller goes on to load
trajectories, prepare programs and upload inputs. (A daemon *thread*
is deliberately not used: the tunneled PJRT client serializes and a
concurrent thread blocked in execute can wedge the main thread's
dispatches.) On CPU / interpret backends this is a no-op. Idempotent.

The reference has no analogous cost anywhere: its native engines are
precompiled binaries (asap3/Zeo++/RINGS). On a standard TPU VM (local
libtpu) Mosaic initialization is also effectively instant; this module
exists for remote-tunneled PJRT backends.
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)

_handle = None
_done = False


def warmup_mosaic(block: bool = False):
    """Dispatch (or await) the one-time Mosaic runtime warmup.

    Call as early as possible after the backend is up — e.g. right
    after ``jax.devices()``. The tiny kernel is dispatched
    asynchronously; pass ``block=True`` to wait for it. Returns the
    in-flight result array on TPU backends, None otherwise.
    """
    global _handle, _done
    import os

    if os.environ.get("AMOF_TPU_NO_WARMUP"):
        return None
    import jax

    try:
        if jax.default_backend() in ("cpu", "METAL"):
            return None
    except Exception:  # backend init failed — nothing to warm
        return None

    if _handle is None and not _done:
        try:
            import jax.numpy as jnp
            from jax.experimental import pallas as pl

            def _copy(x_ref, o_ref):
                o_ref[:] = x_ref[:]

            x = jnp.ones((8, 128), jnp.float32)
            # compile is synchronous (~seconds, persistent-cached);
            # EXECUTION is async — the worker-side Mosaic init runs
            # while the caller proceeds
            _handle = pl.pallas_call(
                _copy, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
            )(x)
        except Exception as e:  # noqa: BLE001 — warmup is best-effort
            logger.debug("mosaic warmup failed (harmless): %s", e)
            _done = True
            return None
    if block and _handle is not None:
        try:
            _handle.block_until_ready()
        except Exception as e:  # noqa: BLE001
            logger.debug("mosaic warmup failed (harmless): %s", e)
        _handle, _done = None, True
    return _handle
