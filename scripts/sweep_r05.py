#!/usr/bin/env python3
"""Round-5 on-TPU measurement sweep (VERDICT r4 items #1/#2/#3/#4).

Runs bench.py points back-to-back in fresh subprocesses (env levers read
at trace time) and appends one JSON line each to docs/perf_ab_r05.jsonl:

  train_mixed_b16       HEAD Mixed steps/s + TRUE analytic MFU
  train_mixed_b32       the round-4 compile-OOM config: remat_tg auto-on
                        + the 6D-free nearest-up must make it fit again
  train_{none,rec,ganonly}_b16   the regime matrix (the staged protocol's
                        stage 1-2 wall-clock lives in None/Rec)
  recon_b128            serving re-confirm at HEAD
  recon_b128_kbf16      SAN_TPU_KSPACE=bf16 serving throughput (the
                        f32-k-space call, measured; dPSNR side is
                        scripts/parity_transplant.py with the lever)

Each point is timeout-bounded and failures are recorded, not fatal
(tunnel outages happen; bench.py's own watchdog emits suspect artifacts).

Usage: python scripts/sweep_r05.py [--only P1,P2] [--iters 3]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_point(name, mode, env_overrides, batch, iters, repeats, timeout_s,
              reg=None):
    env = dict(os.environ)
    env.update(env_overrides)
    cmd = [sys.executable, os.path.join(REPO, "bench.py"), "--mode", mode,
           "--batch", str(batch), "--iters", str(iters),
           "--repeats", str(repeats)]
    if reg is not None:
        cmd += ["--reg", reg]
    t0 = time.time()
    try:
        proc = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True,
                              text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired as e:
        tail = e.stderr or b""
        if isinstance(tail, bytes):
            tail = tail.decode(errors="replace")
        return {"point": name, "error": f"timeout after {timeout_s}s",
                "stderr_tail": tail.splitlines()[-5:]}
    line = None
    for ln in proc.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                rec = json.loads(ln)
            except json.JSONDecodeError:
                continue
            if "metric" in rec:
                line = rec
    if line is None:
        return {"point": name, "error": f"rc={proc.returncode}",
                "stderr_tail": proc.stderr.splitlines()[-5:]}
    line["point"] = name
    line["env"] = env_overrides
    line["wall_s"] = round(time.time() - t0, 1)
    return line


POINTS = [
    # name, mode, reg, batch, env
    ("train_mixed_b16", "train", "Mixed", 16, {}),
    ("train_mixed_b32", "train", "Mixed", 32, {}),
    ("recon_b128", "recon", None, 128, {}),
    ("recon_b128_kbf16", "recon", None, 128, {"SAN_TPU_KSPACE": "bf16"}),
    ("train_none_b16", "train", "None", 16, {}),
    ("train_rec_b16", "train", "Rec", 16, {}),
    ("train_ganonly_b16", "train", "GAN-Only", 16, {}),
    # remat A/Bs (VERDICT r4 #1c): dots keeps the cascade DFT products in
    # the backward; remat_tg=on at b16 measures the lever's cost where it
    # is not needed for fitting (auto only enables it at >= 24)
    ("train_mixed_b16_dots", "train", "Mixed", 16, {"SAN_TPU_REMAT": "dots"}),
    ("train_mixed_b16_rtg", "train", "Mixed", 16, {"SAN_TPU_REMAT_TG": "on"}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--recon_iters", type=int, default=4)
    ap.add_argument("--timeout", type=int, default=3600)
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated point names")
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "perf_ab_r05.jsonl"))
    args = ap.parse_args()

    only = set(args.only.split(",")) if args.only else None
    for name, mode, reg, batch, env in POINTS:
        if only and name not in only:
            continue
        iters = args.recon_iters if mode == "recon" else args.iters
        print(f"[sweep] {name} ...", flush=True)
        rec = run_point(name, mode, env, batch, iters, args.repeats,
                        args.timeout, reg=reg)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[sweep] {name}: "
              + (f"value={rec.get('value')} {rec.get('unit')} "
                 f"mfu={rec.get('mfu')}" if "error" not in rec
                 else f"ERROR {rec['error']}"), flush=True)


if __name__ == "__main__":
    main()
