"""Persistent JAX compilation cache for interactive front-ends.

Mosaic kernel compiles cost tens of seconds each (hundreds through a remote
TPU tunnel); the reference's CPU renderer shows pixels immediately
(``/root/reference/src/gui.rs:216-224``), so a cold interactive start that
recompiles everything is the single worst latency regression vs the
reference. Enabling JAX's persistent compilation cache turns every launch
after the first into a warm start.

Called by the CLI, the GUI, and the bench tools at startup; safe to call
multiple times and after JAX is initialized.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compile_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` (default: the
    repo-level ``.jax_cache``, shared with the test suite). Returns the
    cache directory in use."""
    import jax

    cache_dir = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
