"""Persistent XLA compilation cache setup.

Remote TPU compiles in this environment take minutes per program; caching
compiled executables on disk makes repeated benchmark/eval runs start hot."""

from __future__ import annotations

import os


def enable_persistent_cache(path: str = None) -> None:
    import jax
    path = path or os.environ.get('GHN3_JAX_CACHE',
                                  os.path.join(os.path.dirname(os.path.dirname(
                                      os.path.dirname(os.path.abspath(__file__)))),
                                      '.jax_cache'))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    except Exception:
        pass  # older jax without the persistent cache knobs
