"""Persistent XLA compilation cache.

Enabled by default at package import: index workloads re-run the same jitted
kernels across processes (DB reopen, bench sweeps, tests), and TPU/CPU
compilation is expensive (tens of seconds for the beam-search while_loops).
Opt out with VECDB_TPU_NO_JIT_CACHE=1 or point VECDB_TPU_JIT_CACHE_DIR at a
different directory.
"""

from __future__ import annotations

import os

_enabled = False


def enable() -> None:
    global _enabled
    if _enabled or os.environ.get("VECDB_TPU_NO_JIT_CACHE"):
        return
    import jax

    cache_dir = os.environ.get(
        "VECDB_TPU_JIT_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "vecdb_tpu_jit"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    _enabled = True
