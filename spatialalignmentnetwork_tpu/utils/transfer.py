"""Complex-safe host <-> device transfer.

Some TPU relay backends (observed on the 'axon' tunnel platform) implement
float/int buffer DMA but return UNIMPLEMENTED for complex64 host<->device
transfers, while on-device complex arithmetic (FFT, abs, complex matmul)
works fine. Independent of that bug, shipping complex data as a planar
real/imag float32 pair is the TPU-friendly boundary layout anyway: two
dense f32 DMAs plus one trivially-fused lax.complex on device.

All host->device crossings of complex data in the framework route through
``to_device`` / ``shard_to_device`` / ``multihost_to_device``; readbacks of
complex arrays route through ``to_host``. Real arrays pass through
unchanged at zero extra cost.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.partial(jax.jit, inline=True)
def _combine(re, im):
    return jax.lax.complex(re, im)


@jax.jit
def _split(x):
    return jnp.real(x), jnp.imag(x)


def _planar_f32(x):
    """Host complex array -> contiguous (real, imag) float32 pair."""
    x = np.asarray(x)
    return (
        np.ascontiguousarray(x.real, dtype=np.float32),
        np.ascontiguousarray(x.imag, dtype=np.float32),
    )


def to_device(x, sharding=None):
    """Host array -> device array; complex shipped as a planar f32 pair.

    Complex inputs are cast to complex64 (the framework-wide k-space dtype,
    reference convention /root/reference/paired_dataset.py:63).
    """
    if isinstance(x, jax.Array) and not isinstance(x, np.ndarray):
        return x if sharding is None else jax.device_put(x, sharding)
    x = np.asarray(x)
    if not np.iscomplexobj(x):
        return jax.device_put(x, sharding)
    re, im = _planar_f32(x)
    return _combine(jax.device_put(re, sharding), jax.device_put(im, sharding))


def to_host(x):
    """Device array -> host numpy; complex read back as a planar f32 pair."""
    if not isinstance(x, jax.Array) or isinstance(x, np.ndarray):
        return np.asarray(x)
    if not jnp.iscomplexobj(x):
        return np.asarray(x)
    re, im = _split(x)
    return np.asarray(re) + 1j * np.asarray(im)


def tree_to_device(tree, sharding=None):
    """to_device over every leaf of a pytree (one shared sharding)."""
    return jax.tree_util.tree_map(lambda x: to_device(x, sharding), tree)


def _multihost_from_local_device(sharding, x):
    """Process-local jax.Array -> global array with NO host round trip:
    slice the local rows onto this process's addressable shards
    (device-to-device) and glue with make_array_from_single_device_arrays.
    Assumes the leading-axis sharding gives this process one contiguous
    global row block equal to its local batch — true for the P(axis0)
    meshes parallel/mesh.py builds."""
    gshape = (x.shape[0] * jax.process_count(),) + tuple(x.shape[1:])
    spans = []
    for d, idx in sharding.addressable_devices_indices_map(gshape).items():
        sl = idx[0]
        spans.append((sl.start or 0,
                      gshape[0] if sl.stop is None else sl.stop, d))
    spans.sort(key=lambda t: t[0])
    base = spans[0][0]
    total = sum(s1 - s0 for s0, s1, _ in spans)
    if total != x.shape[0] or spans[-1][1] - base != x.shape[0]:
        raise ValueError(
            f"local batch {x.shape[0]} does not tile this process's "
            f"addressable shards {spans} of global shape {gshape}"
        )
    shards = [
        jax.device_put(x[s0 - base:s1 - base], d) for s0, s1, d in spans
    ]
    return jax.make_array_from_single_device_arrays(gshape, sharding, shards)


def multihost_to_device(sharding, x):
    """Assemble a global array from this process's local batch rows;
    complex-safe (planar pair). Device inputs stay on device — the train
    loop feeds jit-preprocessed device batches, and a np.asarray here
    would block on a device->host readback of the full batch every step."""
    if isinstance(x, jax.Array) and not isinstance(x, np.ndarray):
        if jnp.iscomplexobj(x):
            re, im = _split(x)
            return _combine(
                _multihost_from_local_device(sharding, re),
                _multihost_from_local_device(sharding, im),
            )
        return _multihost_from_local_device(sharding, x)
    x = np.asarray(x)
    if not np.iscomplexobj(x):
        return jax.make_array_from_process_local_data(sharding, x)
    re, im = _planar_f32(x)
    return _combine(
        jax.make_array_from_process_local_data(sharding, re),
        jax.make_array_from_process_local_data(sharding, im),
    )
