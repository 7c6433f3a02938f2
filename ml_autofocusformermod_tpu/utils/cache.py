"""Persistent XLA compilation cache setup (one place, many entry points).

First compiles through the remote-compile tunnel take minutes; the
on-disk cache makes reruns instant, and a timed-out run's finished
sub-compiles are reused on relaunch.
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def enable_compile_cache(cache_dir: str | None = None) -> str:
    import jax

    cache_dir = cache_dir or os.path.join(_REPO_ROOT, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
