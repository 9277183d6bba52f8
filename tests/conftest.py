"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize imports jax at interpreter start with
JAX_PLATFORMS=axon (the tunneled TPU), so plain env vars are too late here —
use jax.config.update before any backend is initialized instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite compiles many similar jitted
# steps; cached XLA binaries cut full-suite wall time drastically on reruns
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def write_h5_volume(path, protocal, shape=(4, 24, 24), seed=0, maxval=1.0):
    """One synthetic h5 volume in the schema the datasets consume
    (`image` dataset + `max`/`acquisition` attrs) — the single source of
    that schema for every test fixture. Returns the raw image."""
    import numpy as np
    import h5py

    rng = np.random.default_rng(seed)
    img = rng.random(shape).astype(np.float32) * maxval
    with h5py.File(path, "w") as h5:
        h5.create_dataset("image", data=img)
        h5.attrs["max"] = float(img.max())
        h5.attrs["acquisition"] = protocal
    return img
