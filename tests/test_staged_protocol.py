"""The reference's 4-stage training protocol through the real CLI
(commands_train_test.sh:32-38): Single-Modal -> Multi-Modal(net_mask) ->
GAN-Only(net_mask) -> Proposed/Mixed(net_mask,D,G,T), with partial
--load_nets warm starts chaining the checkpoints."""

import argparse
import os

import numpy as np
import h5py
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("staged")
    data = root / "data"
    data.mkdir()
    from tests.conftest import write_h5_volume

    rows = []
    for v in range(2):
        for i, proto in enumerate(("T1", "T2")):
            write_h5_volume(data / f"p{v}_{proto}.h5", proto,
                            seed=2 * v + i)
        rows.append(f"p{v}_T1.h5,p{v}_T2.h5")
    csv = data / "pairs.csv"
    csv.write_text("\n".join(rows) + "\n")
    return root, csv


def _args(logdir, csv, reg, protocals, resume=None, load_nets=None):
    return argparse.Namespace(
        logdir=logdir, resume=resume, load_nets=load_nets, epoch=1,
        batch_size=2, num_workers=2, lr=1e-4, intel_stop=1, reg=reg,
        smooth_weight=1000.0, gan_weight=0.1, gan_sim_weight=1.0,
        sim_weight=1.0, mask="equispaced", sparsity=0.25, train=str(csv),
        val=str(csv), crop=16, coils=1, protocals=protocals,
        aux_aug="PBSpline", prefetch=True, use_amp=False, force_gpu=True,
        net_scale="tiny", data_parallel=False, platform=None, seed=0,
        trace_at=0, save_opt=False,
    )


def test_four_stage_protocol(workspace):
    root, csv = workspace
    from spatialalignmentnetwork_tpu.engine import train as train_cli

    base = str(root / "LOG")
    # 1. Single-Modal
    train_cli.main(_args(base + "/single", csv, "None", ["T2", "None"]))
    best1 = base + "/single/ckpt/best.pt"
    assert os.path.isdir(best1)
    # 2. Multi-Modal, net_mask warm start
    train_cli.main(_args(base + "/multi", csv, "None", ["T2", "T1"],
                         resume=best1, load_nets=["net_mask"]))
    # 3. GAN-Only pretrain, net_mask warm start
    train_cli.main(_args(base + "/ganonly", csv, "GAN-Only", ["T2", "T1"],
                         resume=best1, load_nets=["net_mask"]))
    best3 = base + "/ganonly/ckpt/best.pt"
    assert os.path.isdir(best3)
    # 4. Proposed (Mixed), mask+D+G+T warm start
    train_cli.main(_args(base + "/proposed", csv, "Mixed", ["T2", "T1"],
                         resume=best3,
                         load_nets=["net_mask", "net_D", "net_G", "net_T"]))
    best4 = base + "/proposed/ckpt/best.pt"
    assert os.path.isdir(best4)

    # the warm-started nets carried over: stage-4 initial net_T equals
    # stage-3 best net_T is not directly observable post-training, but the
    # mask must be identical across all stages (it is never trained)
    from spatialalignmentnetwork_tpu.engine.checkpoint import ckpt_load

    m1 = ckpt_load(best1)["net_mask"]["pruned"]
    m4 = ckpt_load(best4)["net_mask"]["pruned"]
    np.testing.assert_array_equal(m1, m4)

    # final eval of the proposed model
    from spatialalignmentnetwork_tpu.engine import eval as eval_cli

    res = eval_cli.main(argparse.Namespace(
        resume=best4, save=None, metric=None, val=str(csv), crop=16,
        protocals=["T2", "T1"], aux_aug=-1.0, data_parallel=False,
        platform=None,
    ))
    assert np.isfinite(res["metric_PSNR"])
