"""Persistent XLA compilation cache setup.

Remote TPU compiles in this environment take minutes per program; caching
compiled executables on disk makes repeated benchmark/eval runs start hot."""

from __future__ import annotations

import functools
import hashlib
import os


@functools.lru_cache(maxsize=1)
def _host_fingerprint() -> str:
    """Short digest of the host CPU's feature flags.

    XLA:CPU persists AOT executables specialized to the compiling machine's
    ISA; loading an artifact cached by a DIFFERENT host (the driver machines
    rotate) warns about mismatched machine features and can SIGILL/segfault
    (observed killing the round-3 test suite mid-run). Scoping the cache dir
    per host CPU keeps artifacts where they are safe to load."""
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if line.startswith('flags'):
                    return hashlib.sha256(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform
    return hashlib.sha256(platform.processor().encode()).hexdigest()[:10]


def enable_persistent_cache(path: str = None) -> None:
    import jax
    if path is None and 'GHN3_JAX_CACHE' not in os.environ:
        # TPU executables are device-targeted, not host-ISA-specialized —
        # share one dir so driver bench runs start hot across host rotations.
        # Only XLA:CPU AOT results embed host ISA; scope those per host.
        # Callers settle the platform before calling (dryrun_multichip forces
        # cpu first), so initializing the backend here is safe.
        suffix = (f'_cpu_{_host_fingerprint()}'
                  if jax.default_backend() == 'cpu' else '')
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), f'.jax_cache{suffix}')
    path = path or os.environ.get('GHN3_JAX_CACHE')
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    except Exception:
        pass  # older jax without the persistent cache knobs
