"""Worker for the multi-process multi-host input-sharding tests.

Launched by tests/test_multihost.py as `python multihost_worker.py
<coordinator> <num_processes> <process_id> <outdir> [local_devices]` with
a CPU platform (the parent forces `local_devices` virtual CPU devices per
process via XLA_FLAGS; default 1). Each process:
  1. iterates a sharded Loader and records which dataset rows it loaded;
  2. glues its local shard into the global batch
     (shard_batch_multihost) and records the jitted global mean — plus
     the per-process addressable-shard layout, the corner where
     make_array_from_process_local_data bugs live when local_devices > 1;
  3. runs ONE tiny Rec train step on a fixed global batch through
     CSModel.distribute + the multi-host set_input path and records the
     loss, which must match a single-process run of the same step.
"""

import json
import os
import sys

import numpy as np


def main():
    coord, nproc, pid, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    ld = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    import jax

    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == ld, (
        f"expected {ld} local devices, got {jax.local_device_count()}"
    )
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from spatialalignmentnetwork_tpu.data.loader import Loader
    from spatialalignmentnetwork_tpu.parallel.mesh import (
        make_mesh, shard_batch_multihost,
    )

    N = 16

    class RowIdDataset:
        """Item i is a pair of [1, 4, 4] planes tagged with the row id."""

        def __len__(self):
            return N

        def __getitem__(self, i):
            return [np.full((1, 4, 4), i, np.float32),
                    np.full((1, 4, 4), 1000 + i, np.float32)]

    # per-process batch: 2 rows per LOCAL device, so the local shard
    # itself must be split across this process's ld addressable devices
    loader = Loader(RowIdDataset(), batch_size=2 * ld, shuffle=True,
                    drop_last=True, seed=42, num_shards=nproc,
                    shard_index=pid)
    mesh = make_mesh()
    assert len(mesh.devices.ravel()) == nproc * ld

    @jax.jit
    def global_mean(x):
        return jnp.mean(x)

    rows, means = [], []
    shard_layout = None
    for batch in loader:
        rows.extend(batch[0][:, 0, 0, 0].astype(int).tolist())
        g = shard_batch_multihost(mesh, batch)
        assert g[0].shape[0] == 2 * ld * nproc, g[0].shape  # GLOBAL batch
        if shard_layout is None:
            # each addressable shard: 2 rows on one local device, and the
            # rows this process loaded are exactly the rows its devices
            # hold (no cross-host reshuffle)
            shards = sorted(
                g[0].addressable_shards, key=lambda s: s.index[0].start
            )
            shard_layout = {
                "n_addressable": len(shards),
                "rows_per_shard": [int(s.data.shape[0]) for s in shards],
                "local_rows": sorted(
                    int(r) for s in shards
                    for r in np.asarray(s.data)[:, 0, 0, 0]
                ),
            }
        means.append(float(global_mean(g[0])))

    # --- one sharded Rec train step on a fixed global batch ---
    # identical cfg/batch to the parent's single-process reference run
    from tests.test_engine import tiny_cfg, _batch
    from spatialalignmentnetwork_tpu.engine.csmodel import CSModel

    net = CSModel(cfg=tiny_cfg("Rec"), seed=0)
    net.distribute(mesh)

    full, aux = _batch(shape=16, n=nproc * ld, seed=0)
    lo, hi = pid * ld, (pid + 1) * ld  # one global row per DEVICE
    net.set_input(np.asarray(full)[lo:hi], np.asarray(aux)[lo:hi])
    net.update()
    loss = float(net.get_vis("scalars")["scalars"]["loss_all"])

    # same step with DEVICE-array local shards: exercises the
    # no-host-round-trip assembly (_multihost_from_local_device), the path
    # the train loop's jit-preprocessed batches take
    from spatialalignmentnetwork_tpu.utils.transfer import to_device

    net_dev = CSModel(cfg=tiny_cfg("Rec"), seed=0)
    net_dev.distribute(mesh)
    net_dev.set_input(to_device(np.asarray(full)[lo:hi]),
                      to_device(np.asarray(aux)[lo:hi]))
    net_dev.update()
    loss_dev = float(net_dev.get_vis("scalars")["scalars"]["loss_all"])

    with open(os.path.join(outdir, f"p{pid}.json"), "w") as f:
        json.dump({"rows": rows, "means": means, "loss": loss,
                   "loss_dev": loss_dev, "shard_layout": shard_layout}, f)
    print(f"worker {pid}: OK rows={rows} loss={loss}", flush=True)


if __name__ == "__main__":
    main()
