"""TPU session helpers: persistent compile cache + timing.

This image routes XLA:TPU compiles through a remote-compile tunnel, so a
cold compile of even a trivial kernel costs minutes. Enabling the
persistent compilation cache once per process makes every subsequent
process hit the disk cache instead.
"""

from __future__ import annotations

import os
import time

import jax

_CACHE_ENABLED = False


def setup_compile_cache(path: str | None = None) -> None:
    """Enable the persistent compilation cache (idempotent)."""
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    if path is None:
        path = os.environ.get(
            "RTE_TPU_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"),
        )
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _CACHE_ENABLED = True


def timed(fn, *args, warmup: int = 1, iters: int = 3, **kwargs):
    """Time a device computation with block_until_ready bracketing.

    Returns (result, seconds_per_iter). The reference self-times its render
    with chrono (RaytracingEngine.cpp:292-299); this is the JAX analogue
    with proper async-dispatch handling.
    """
    result = None
    for _ in range(max(warmup, 1)):
        result = jax.block_until_ready(fn(*args, **kwargs))
    t0 = time.perf_counter()
    for _ in range(iters):
        result = jax.block_until_ready(fn(*args, **kwargs))
    dt = (time.perf_counter() - t0) / iters
    return result, dt
