"""Rehearsal of the turnkey real-data parity runner.

`scripts/run_reference_parity.sh` is the one command that, given a raw
`brain_nii/` root, executes convert -> split -> the reference's 4-stage
recipe -> md5-cached eval -> tolerance compare. The real fastMRI brain
data is not present in CI, so this rehearses the ENTIRE pipeline on a
synthetic mirror of the real directory layout (NIfTI volumes written by
the bundled minimal writer, read back through the same conversion path a
real run would take), at smoke scale via the script's env knobs:

  1. fresh root, no reference metrics: all stages run, exit 0, report
     says where to drop the reference JSONs;
  2. reference metrics added (self-copy): cached stages SKIP, stage 3
     compares and PASSes;
  3. perturbed reference PSNR: the runner FAILs loudly (nonzero exit).

Reference provenance: commands_train_test.sh:32-62 (the staged protocol +
md5-cached eval this wraps).
"""

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNNER = os.path.join(REPO, "scripts", "run_reference_parity.sh")


@pytest.fixture(scope="module")
def brain_root(tmp_path_factory):
    """A synthetic mirror of the real layout: <root>/{T1,T2}/vNN.nii."""
    from spatialalignmentnetwork_tpu.data.nifti_minimal import write_nii

    root = tmp_path_factory.mktemp("brain_nii")
    rng = np.random.default_rng(7)
    for proto in ("T1", "T2"):
        (root / proto).mkdir()
    for v in range(4):
        # same anatomy, modality-specific contrast; positive voxels so the
        # h5 max-normalization contract holds
        base = np.abs(rng.standard_normal((24, 24, 4))) + 0.1
        for proto, gain in (("T1", 1.0), ("T2", 0.6)):
            write_nii(str(root / proto / f"vol{v:02d}.nii"),
                      (base * gain).astype(np.float32))
    return root


def _run(root, work):
    env = dict(os.environ)
    env.update(
        # smoke-scale knobs; --platform cpu because the runner's train/eval
        # children do not inherit conftest's in-process platform override
        EPOCH="1", BATCH="2", INTEL_STOP="1",
        FLAGS="--prefetch --crop 16 --net_scale tiny --platform cpu "
              "--num_workers 2 --seed 0",
        EVAL_FLAGS="--crop 16 --platform cpu",
        TOL_DB="0.1",
        PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""),
    )
    return subprocess.run(
        ["bash", RUNNER, str(root), str(work)],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=3000,
    )


def test_parity_runner_end_to_end(brain_root, tmp_path):
    work = tmp_path / "work"

    # ---- run 1: fresh root, no reference metrics ----
    proc = _run(brain_root, work)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    report = work / "parity_report.txt"
    assert report.is_file()
    assert "no reference metrics" in report.read_text()
    # every stage produced its artifact
    assert (work / "h5" / "pairs.csv").is_file()
    assert (work / "h5" / "paired_train.csv").is_file()
    enames = [
        "None_4xEquispacedT2_PBSplineNone",
        "T1_4xEquispacedT2_PBSplineNone",
        "T1_4xEquispacedT2_PBSplineProposed",
    ]
    for ename in enames:
        assert (work / "eval" / f"{ename}.json").is_file(), ename
        assert (work / "eval" / ename / "md5sum").is_file(), ename
    # 4 stages trained (GAN-Only has no eval but must have a checkpoint)
    assert (work / "LOG" / "T1_4xEquispacedT2_PBSplineGANOnly" / "ckpt"
            / "best.pt").exists()

    # ---- run 2: self-copied reference metrics -> cached stages + PASS ----
    ref_dir = brain_root / "reference_metrics"
    ref_dir.mkdir()
    for ename in enames:
        shutil.copy(work / "eval" / f"{ename}.json",
                    ref_dir / f"{ename}.json")
    proc2 = _run(brain_root, work)
    assert proc2.returncode == 0, proc2.stdout + proc2.stderr
    # idempotency: the converted volumes, the trained stages, and the
    # md5-cached evals must all be skipped, not redone
    assert "stage 0 convert: SKIP" in proc2.stdout
    assert proc2.stdout.count("SKIP train") == 4
    assert proc2.stdout.count("SKIPPED") == 3          # md5-cached evals
    assert proc2.stdout.count(": PASS") == 3, proc2.stdout

    # ---- run 3: perturbed reference PSNR -> loud FAIL ----
    bad = ref_dir / f"{enames[-1]}.json"
    payload = json.loads(bad.read_text())
    rows = payload["volumes"] if isinstance(payload, dict) else payload
    for row in rows:
        row["metric_PSNR"] = row["metric_PSNR"] + 1.0
    bad.write_text(json.dumps(payload))
    proc3 = _run(brain_root, work)
    assert proc3.returncode != 0
    assert f"{enames[-1]}: FAIL" in proc3.stdout, proc3.stdout


def test_split_manifests_deterministic(tmp_path):
    """Volume-level split: disjoint, exhaustive, seed-stable."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from make_split_manifests import split_rows
    finally:
        sys.path.pop(0)

    rows = [f"v{i:02d}_T1.h5,v{i:02d}_T2.h5" for i in range(10)]
    a = split_rows(rows, (0.7, 0.15, 0.15), seed=3)
    b = split_rows(rows, (0.7, 0.15, 0.15), seed=3)
    assert a == b
    train, val, test = a
    parts = train + val + test
    assert sorted(parts) == sorted(rows)       # exhaustive, disjoint
    assert len(train) >= len(val) and len(test) >= 1

    with pytest.raises(ValueError):
        split_rows(rows[:2], (0.7, 0.15, 0.15), seed=0)
