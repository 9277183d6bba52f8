#!/usr/bin/env python3
"""Quickstart: synthesize paired volumes, train briefly, evaluate.

Runs anywhere (forces CPU unless --platform given); demonstrates the whole
surface: data prep -> train CLI -> checkpoint -> eval CLI -> metrics.

    python examples/quickstart.py [--epochs N] [--platform cpu|tpu]
"""

import argparse
import os
import sys
import tempfile

import numpy as np
import h5py

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_data(root, volumes=2, slices=6, size=24):
    rng = np.random.default_rng(0)
    rows = []
    for v in range(volumes):
        # smooth synthetic anatomy: the T1/T2 pair shares structure with
        # different contrast, like the real task
        base = rng.random((slices, size, size)).astype(np.float32)
        for _ in range(3):
            base = (base + np.roll(base, 1, -1) + np.roll(base, 1, -2)) / 3
        for proto, img in (("T1", base), ("T2", base**2)):
            img = img / img.max()
            with h5py.File(os.path.join(root, f"p{v}_{proto}.h5"), "w") as h5:
                h5.create_dataset("image", data=img.astype(np.float32))
                h5.attrs["max"] = 1.0
                h5.attrs["acquisition"] = proto
        rows.append(f"p{v}_T1.h5,p{v}_T2.h5")
    csv = os.path.join(root, "pairs.csv")
    with open(csv, "w") as f:
        f.write("\n".join(rows) + "\n")
    return csv


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--platform", type=str, default="cpu")
    args = p.parse_args()

    root = tempfile.mkdtemp(prefix="san_quickstart_")
    csv = make_data(root)
    logdir = os.path.join(root, "log")

    from spatialalignmentnetwork_tpu.engine import train as train_cli
    from spatialalignmentnetwork_tpu.engine import eval as eval_cli

    targs = argparse.Namespace(
        logdir=logdir, resume=None, load_nets=None, epoch=args.epochs,
        batch_size=4, num_workers=2, lr=1e-4, intel_stop=0, reg="Rec",
        smooth_weight=1000.0, gan_weight=0.1, gan_sim_weight=1.0,
        sim_weight=1.0, mask="equispaced", sparsity=0.25, train=csv,
        val=csv, crop=16, coils=1, protocals=["T2", "T1"],
        aux_aug="PBSpline", prefetch=True, use_amp=False, force_gpu=True,
        net_scale="tiny", data_parallel=False, platform=args.platform,
        seed=0, trace_at=0, save_opt=False,
    )
    train_cli.main(targs)

    ckpts = sorted(os.listdir(os.path.join(logdir, "ckpt")))
    final = os.path.join(logdir, "ckpt", ckpts[-1])
    print("\nevaluating", final)
    eval_cli.main(argparse.Namespace(
        resume=final, save=None, metric=None, val=csv, crop=16,
        protocals=["T2", "T1"], aux_aug=-1.0, data_parallel=False,
        platform=None,
    ))


if __name__ == "__main__":
    main()
