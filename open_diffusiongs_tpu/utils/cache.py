"""Persistent XLA compilation cache setup.

Setting the env var `JAX_COMPILATION_CACHE_DIR` inside a Python script
does NOT work on this stack: the TPU plugin imports jax at interpreter
start, so jax's config reads the environment before user code runs and
`jax_compilation_cache_dir` stays None — the cache silently never
initializes (diagnosed in docs/PERF_NOTES.md round 3; every warm start
was paying the full ~30-40 s XLA compile).  The reliable path is the
programmatic `jax.config.update` below, which works no matter when jax
was imported.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str:
    """Point jax at a persistent compilation-cache directory.

    Precedence: explicit `path` arg > `JAX_COMPILATION_CACHE_DIR` env >
    `/tmp/jax_cache`.  Safe to call multiple times.  Returns the path.
    """
    import jax

    path = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or "/tmp/jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    return path
