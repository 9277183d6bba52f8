"""AOT export of the serving path.

Serializes the jitted reconstruction function (the CSModel.reconstruct
serving path) to a portable StableHLO artifact via jax.export — the
deployment story for production serving: the artifact replays on any
runtime with the same jax/XLA ABI without python model code, and weights
travel inside it as baked constants or alongside it as inputs.

Usage:
    from spatialalignmentnetwork_tpu.engine.export import (
        export_reconstruct, load_exported,
    )
    export_reconstruct(net, batch_shape=(8, 1, 320, 320), path="recon.bin")
    fn = load_exported("recon.bin")
    rec = fn(img_full, img_aux)
"""

import jax
import jax.numpy as jnp


def _recon_fn(net):
    # the exported computation IS the live serving step (CSModel.recon_step)
    # with the current state baked in as constants — one source of truth
    state = net.state

    def fn(img_full, img_aux):
        return net.recon_step(state, img_full, img_aux)

    return fn


def export_reconstruct(net, batch_shape, path=None):
    """Serialize the eval-mode recon path for `batch_shape` (N, C, H, W).

    Weights/stats are captured as constants inside the artifact. Returns
    the serialized bytes (also written to `path` when given).
    """
    from jax import export as jexport

    spec_full = jax.ShapeDtypeStruct(batch_shape, jnp.complex64)
    spec_aux = jax.ShapeDtypeStruct(batch_shape, jnp.complex64)
    exported = jexport.export(jax.jit(_recon_fn(net)))(spec_full, spec_aux)
    blob = exported.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_exported(path_or_bytes):
    """Deserialize an exported recon artifact -> callable(img_full, aux)."""
    from jax import export as jexport

    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    exported = jexport.deserialize(blob)
    return exported.call
