"""Device-mesh construction and data-parallel sharding.

The reference is strictly single-GPU (SURVEY.md §2.3: no torch.distributed,
no collectives anywhere); this layer is new TPU-native design. The model
family is small per-slice CNNs, so the scaling axis is the batch (slices /
whole 3-D volumes): a 1-D 'data' mesh over the TPU slice, parameters and
optimizer state replicated, batches sharded over the leading axis. Under
`jax.jit` with these shardings, XLA's SPMD partitioner inserts the gradient
all-reduce (psum over ICI) automatically — the only collective this workload
needs. BatchNorm statistics are computed over the GLOBAL batch (a cross-
device mean the partitioner also handles), i.e. sync-BN semantics for free.

Multi-host slices: give each host the loader shard for its addressable
devices and build global arrays with
jax.make_array_from_process_local_data(sharding, local_batch) — the step
functions are unchanged.
"""

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis: str = "data") -> Mesh:
    """1-D mesh over the first n (default: all) devices."""
    devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f"need {n_devices} devices, have {len(devices)}"
        )
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (axis,))


def dp_shardings(mesh: Mesh, state):
    """(state_sharding, batch_sharding) pytree-prefix specs for a DP step."""
    replicated = NamedSharding(mesh, P())
    batch = NamedSharding(mesh, P(mesh.axis_names[0]))
    state_s = jax.tree_util.tree_map(lambda _: replicated, state)
    return state_s, batch


def replicate_state(mesh: Mesh, state):
    """Place every state leaf fully replicated on the mesh."""
    replicated = NamedSharding(mesh, P())
    return jax.device_put(state, replicated)


def shard_batch(mesh: Mesh, batch):
    """Shard each array's leading (batch) axis across the mesh.

    Complex-safe: complex leaves cross host->device as planar f32 pairs
    (utils.transfer), required on relay backends without complex DMA.
    """
    from ..utils.transfer import tree_to_device

    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    return tree_to_device(batch, sharding)


def shard_batch_multihost(mesh: Mesh, local_batch):
    """Assemble a GLOBAL batch from each process's local shard.

    On a multi-host slice every host loads only the rows destined for its
    addressable devices (global_batch = local_batch * num_processes);
    jax.make_array_from_process_local_data glues the host shards into one
    global array without any cross-host data movement. On a single host
    this degenerates to shard_batch.
    """
    from ..utils.transfer import multihost_to_device

    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    return jax.tree_util.tree_map(
        lambda x: multihost_to_device(sharding, x), local_batch
    )
