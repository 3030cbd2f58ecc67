"""Persistent XLA compilation cache.

The axon relay's remote compiles dominate cold-start wall time (100-600 s
for the first program; measured again r4: a (2048,2047) HIGHEST matmul
chain compiles in 6.3 s cold and 0.2 s from a warm cache in a FRESH
process). Executable serialization works through the relay, so enabling
jax's persistent cache makes every driver run after the first reuse the
compiled programs -- bench.py, bench_multichip.py, and the CLI all call
:func:`enable_persistent_cache` at startup.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point jax at a persistent compilation cache directory (default:
    ``.jax_cache/`` beside the repo root, overridable with
    ``PARADIAG_COMPILE_CACHE``; set it to ``off`` to disable). Returns the
    directory used, or None when disabled/unavailable."""
    import jax

    path = path or os.environ.get("PARADIAG_COMPILE_CACHE")
    if path == "off":
        return None
    if path is None:
        root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        path = os.path.join(root, ".jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (OSError, AttributeError):
        return None
    return path
