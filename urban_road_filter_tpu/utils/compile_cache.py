"""Persistent XLA compilation cache for process cold-start.

The reference node is up in milliseconds (/root/reference/src/main.cpp:37-56
— plain C++, nothing to compile at runtime); a jit pipeline pays a
server-side XLA compile per process instead.  `jax_compilation_cache_dir`
amortizes that across processes, and tools/probe_compile_cache.py proved
it WORKS on the tunneled axon backend (measured 2026-08-19, full 131k-pt
production dims): cold process 49.6 s -> warm 18.5 s to the first fetched
result (compile+first-result 37.2 -> 16.9 s; 3 cache entries).

Entry points (replay CLI, bench, soak) call `enable_persistent_cache()`
before the first trace.  The library itself never mutates global jax
config on import — only executables opt in.

Env control:
  URF_COMPILE_CACHE=0      disable
  URF_COMPILE_CACHE=<dir>  use <dir>
  unset / =1               default ~/.cache/urf_xla_cache
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/urf_xla_cache")


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point jax at a persistent compilation cache dir.

    Must run before the first jit compile in the process.  Returns the
    cache dir in use, or None when disabled via URF_COMPILE_CACHE=0.
    """
    env = os.environ.get("URF_COMPILE_CACHE", "")
    if env == "0":
        return None
    cache = path or (env if env not in ("", "1") else DEFAULT_DIR)

    import jax

    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    # Cache every executable: the axon compiles worth saving are seconds
    # to minutes, but small helper graphs (warm-up zeros, pad reshapes)
    # also repay their entry cost on a tunneled backend.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # knob absent on older jax
        pass
    return cache
