"""Persistent XLA compilation cache helper.

The flagship graphs (full VarNet, Mixed train step) take minutes to
compile; caching compiled binaries on disk makes repeat CLI/bench runs
start in seconds. Safe no-op if the backend or config rejects it.
"""

import os


def enable_compilation_cache(cache_dir=None):
    try:
        import jax

        if cache_dir is None:
            cache_dir = os.path.join(
                os.path.expanduser("~"), ".cache", "san_tpu_xla"
            )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        return cache_dir
    except Exception:
        return None
