#!/usr/bin/env python3
"""Serving example: checkpoint -> jitted reconstruction -> StableHLO export.

Demonstrates the deployment surface:
  1. load a trained checkpoint (CSModel(ckpt=...));
  2. batch reconstruction via the cached jitted serving path
     (CSModel.reconstruct — undersamples with the model's own mask and
     runs the ref-guided VarNet, eval semantics);
  3. optional data parallelism over every visible device (--data_parallel);
  4. export the recon step as a portable StableHLO artifact and verify
     the reloaded artifact reproduces the live path bit-for-bit.

With no --resume it trains a tiny synthetic model first (like
examples/quickstart.py), so the example runs anywhere:

    python examples/serve.py [--platform cpu|tpu] [--resume CKPT]
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tiny_checkpoint(workdir, platform):
    """Train a tiny model on synthetic pairs; return the best.pt path."""
    from examples.quickstart import make_data  # same synthetic anatomy
    from spatialalignmentnetwork_tpu.engine import train as train_cli

    data = os.path.join(workdir, "data")
    os.makedirs(data, exist_ok=True)
    csv = make_data(data)
    logdir = os.path.join(workdir, "log")
    args = argparse.Namespace(
        logdir=logdir, resume=None, load_nets=None, epoch=1, batch_size=2,
        num_workers=2, lr=1e-4, intel_stop=1, reg="None",
        smooth_weight=1000.0, gan_weight=0.1, gan_sim_weight=1.0,
        sim_weight=1.0, mask="equispaced", sparsity=0.25, train=csv,
        val=csv, crop=16, coils=1, protocals=["T2", "T1"],
        aux_aug="None", prefetch=True, use_amp=False, force_gpu=True,
        net_scale="tiny", platform=platform,
    )
    train_cli.main(args)
    return os.path.join(logdir, "ckpt", "best.pt")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint to serve (default: train a tiny one)")
    p.add_argument("--platform", type=str, default="cpu")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--data_parallel", action="store_true",
                   help="shard the batch over every visible device")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from spatialalignmentnetwork_tpu.engine.csmodel import CSModel
    from spatialalignmentnetwork_tpu.engine.export import (
        export_reconstruct, load_exported,
    )

    with tempfile.TemporaryDirectory() as workdir:
        ckpt = args.resume or tiny_checkpoint(workdir, args.platform)
        net = CSModel(ckpt=ckpt).eval()
        shape = net.cfg.shape

        if args.data_parallel:
            from spatialalignmentnetwork_tpu.parallel.mesh import make_mesh

            mesh = make_mesh()
            net.distribute(mesh)
            print(f"serving data-parallel over {mesh.size} devices")

        rng = np.random.default_rng(0)
        mk = lambda: (
            rng.random((args.batch, net.cfg.coils, shape, shape))
            + 1j * rng.random((args.batch, net.cfg.coils, shape, shape))
        ).astype(np.complex64)
        full, aux = mk(), mk()

        rec = np.asarray(net.reconstruct(full, aux))
        print(f"reconstructed batch: {rec.shape} {rec.dtype}, "
              f"mean |rec| = {np.abs(rec).mean():.4f}")

        # portable deployment artifact (weights baked in as constants)
        path = os.path.join(workdir, "recon.stablehlo")
        blob = export_reconstruct(net, full.shape, path)
        print(f"exported StableHLO artifact: {len(blob)} bytes")

        from spatialalignmentnetwork_tpu.utils.transfer import to_device

        served = load_exported(path)
        rec2 = np.asarray(served(to_device(full), to_device(aux)))
        np.testing.assert_allclose(rec2, rec, rtol=1e-5, atol=1e-6)
        print("reloaded artifact matches the live serving path")


if __name__ == "__main__":
    main()
