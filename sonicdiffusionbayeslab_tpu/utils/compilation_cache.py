"""Persistent XLA compilation cache.

SD-1.5-sized programs take minutes to compile; production sweeps re-enter
the same (shape, plan-length) signatures constantly.  Enabling JAX's
persistent cache makes every compile after the first a disk hit.  Called by
the CLI and bench entrypoints; idempotent.
"""

from __future__ import annotations

import os
from pathlib import Path

_ACTIVE_DIR: Path | None = None


def enable(cache_dir: str | None = None) -> Path:
    global _ACTIVE_DIR
    import jax

    path = Path(cache_dir or os.environ.get("SDBL_COMPILE_CACHE", "~/.cache/sdbl_xla")).expanduser()
    if _ACTIVE_DIR != path:
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _ACTIVE_DIR = path
    return path
