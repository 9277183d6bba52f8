#!/usr/bin/env python3
"""Measured artifact for the volume-sharded 3-D eval config.

BASELINE configs[4] — "batched 3D volumes sharded across a v5p slice" —
is functionally covered by the sharded bucketed eval
(tests/test_e2e.py::test_eval_cli_data_parallel_matches_solo). This script
records the NUMBERS behind the scaling claim on the virtual 8-device mesh:

1. Wall-clock of a whole-volume eval step, solo vs sharded over the mesh
   (on a shared-core host the honest expectation is parity — same total
   work, one core — the measurement guards against sharding OVERHEAD,
   not for speedup).
2. A collective census of the compiled sharded step: the model is 2-D
   per-slice, so the hot forward must contain NO cross-device collectives
   — only the metric reductions (mean over the batch axis) may psum.
   Zero-collective forward == linear scaling over real chips by
   construction; that, not a fake-mesh timing, is the scaling evidence.

Writes one JSON line per measurement (append to docs/perf_ab_rNN.jsonl).

Usage: python scripts/bench_sharded_eval.py [--shape 320] [--slices 64]
"""

import argparse
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

COLLECTIVES = re.compile(
    r"\b(all-reduce|all-gather|all-to-all|collective-permute|"
    r"reduce-scatter)\b"
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, default=320)
    ap.add_argument("--slices", type=int, default=64,
                    help="bucketed volume batch (divisible by 8)")
    ap.add_argument("--cascades", type=int, default=8)
    ap.add_argument("--chans", type=int, default=18)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from spatialalignmentnetwork_tpu.engine.config import Config
    from spatialalignmentnetwork_tpu.engine.csmodel import CSModel
    from spatialalignmentnetwork_tpu.parallel.mesh import make_mesh

    cfg = Config()
    cfg.sparsity = 0.25
    cfg.lr = 1e-4
    cfg.shape = args.shape
    cfg.coils = 1
    cfg.reg = "Rec"
    cfg.mask = "equispaced"
    cfg.weight_smooth = 1000.0
    cfg.weight_gan = 0.1
    cfg.weight_gan_sim = 1.0
    cfg.weight_sim = 1.0
    cfg.net_R_cascades = args.cascades
    cfg.net_R_chans = args.chans

    rng = np.random.default_rng(0)
    n = args.slices
    mk = lambda: (
        rng.standard_normal((n, 1, args.shape, args.shape))
        + 1j * rng.standard_normal((n, 1, args.shape, args.shape))
    ).astype(np.complex64) * 0.3
    vol_full, vol_aux = mk(), mk()
    valid = np.ones((n,), np.float32)

    def run(shard):
        net = CSModel(cfg=cfg)
        if shard:
            net.distribute(make_mesh(8))
        net.eval()
        net.set_input(vol_full, vol_aux)
        net.test(valid=valid)  # compile + run
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            net.set_input(vol_full, vol_aux)
            psnr = -net.test(valid=valid)
            times.append(time.perf_counter() - t0)
        return net, min(times), psnr

    net_solo, t_solo, psnr_solo = run(False)
    net_dp, t_dp, psnr_dp = run(True)

    # collective census of the compiled sharded test step (the cached step
    # is a jax.jit-wrapped fn: lower -> compile -> optimized HLO text)
    step = next(v for k, v in net_dp._step_cache.items() if k[0] == "test")
    census = {"total": -1}
    try:
        compiled_text = step.lower(
            net_dp.state, *net_dp._batch, np.asarray(valid)
        ).compile().as_text()
        hits = COLLECTIVES.findall(compiled_text)
        census = {"total": len(hits), "kinds": sorted(set(hits))}
    except Exception as e:  # noqa: BLE001 — the census is best-effort
        # context: the expensive solo+sharded timings above must survive a
        # census failure (lower() API drift OR a step-signature mismatch)
        census["error"] = f"{type(e).__name__}: {e}"

    out = {
        "metric": f"sharded_eval_volume{n}x{args.shape}_virtual8",
        "solo_s": round(t_solo, 3),
        "sharded_s": round(t_dp, 3),
        "overhead_vs_solo": round(t_dp / t_solo - 1.0, 4),
        "psnr_match": bool(abs(psnr_solo - psnr_dp) < 1e-3),
        "collectives": census,
        "note": ("virtual 8-device CPU mesh on a shared-core host: parity "
                 "== no sharding overhead; scaling evidence is the "
                 "collective census (2-D-per-slice model -> zero "
                 "forward collectives)"),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
