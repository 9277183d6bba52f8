"""Compiled peak-memory regression guard (VERDICT r4 weak #2).

Round 4's lesson: a 48 MB HBM-margin erosion in the b32 Mixed train step
shipped silently across two rounds and only surfaced when the real chip
refused to compile (15.79 G of 15.75 G). These tests compile the flagship
steps from ABSTRACT inputs on the CPU backend (no execution, no batch
data) and pin `compiled.memory_analysis()` temp bytes under explicit
budgets, so the next erosion fails here instead of on-chip.

CPU budgets are not TPU HBM numbers (different layouts, f32 scratch, no
lane padding) — they are a same-backend regression REFERENCE, calibrated
from the measured values below with ~15% headroom. A failure means the
step's materialization set grew; re-measure on the real chip
(`python -m spatialalignmentnetwork_tpu.utils.membudget --kind train
--batch 32`) before raising any budget.

Calibrated on XLA:CPU (jax 0.8.x, 2026-08-20, round 5, via
`python -m spatialalignmentnetwork_tpu.utils.membudget --platform cpu`) —
the flagship cfg is now bf16 (use_amp=True, like the production steps and
the round-4 on-chip OOM), which also engages the round-5 s2d train
layout (csmodel.build s2d_train auto):
  serving b128:      temp 11.92 GiB   (f32 calibration was 10.30)
  train Mixed b16:   temp 18.68 GiB   (SAN_TPU_REMAT_TG auto -> off)
  train Mixed b32:   temp 36.92 GiB   (SAN_TPU_REMAT_TG auto -> on)
On-TPU ground truth 2026-08-19: b32 Mixed COMPILES AND TRAINS at HEAD
(0.61 steps/s, docs/perf_ab_r05.jsonl) — the round-4 OOM config.
"""

import pytest

from spatialalignmentnetwork_tpu.utils.membudget import compiled_memory

pytestmark = pytest.mark.slow

GIB = 1 << 30

# (kind, batch, temp-bytes budget). Budget = calibrated + ~15%; see the
# module docstring before touching these.
BUDGETS = [
    ("serving", 128, 13.7 * GIB),
    ("train", 16, 21.5 * GIB),
    ("train", 32, 42.0 * GIB),
]


@pytest.mark.parametrize("kind,batch,budget", BUDGETS,
                         ids=[f"{k}_b{b}" for k, b, _ in BUDGETS])
def test_flagship_compiled_memory_under_budget(kind, batch, budget):
    stats = compiled_memory(kind, batch)
    temp = stats["temp_bytes"]
    assert temp is not None and temp > 0, stats
    assert temp <= budget, (
        f"{kind} b{batch}: compiled temp memory {temp / GIB:.2f} GiB "
        f"exceeds the {budget / GIB:.2f} GiB budget — the materialization "
        f"set GREW. Find the new temp (scripts/audit_hbm_dtypes.py names "
        f"the offenders) or justify and re-calibrate per the module "
        f"docstring. Full stats: {stats}"
    )
