#!/usr/bin/env python3
"""A/B the fused Pallas loss kernels in the REAL train step (VERDICT r3 #1).

The round-3 fused SSIM backward (and the grid-sample fwd+bwd kernels) are
the live defaults in the Mixed train step; this runs `bench.py --mode train`
in both directions of each lever in fresh subprocesses (env levers are read
at trace time; a fresh interpreter per point keeps the A/B honest) and
appends one JSON line per point to docs/perf_ab_r04.jsonl.

Points:
  ssim=pallas,gs=pallas   (HEAD default on TPU)
  ssim=jnp,   gs=pallas   (isolates the fused SSIM fwd+bwd)
  ssim=pallas,gs=jnp      (isolates the sampler kernels; r02 measured +12%)

Usage: python scripts/ab_train_losskernels.py [--batch 16] [--iters 3]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_point(name, env_overrides, batch, iters, repeats, timeout_s):
    env = dict(os.environ)
    env.update(env_overrides)
    cmd = [sys.executable, os.path.join(REPO, "bench.py"), "--mode", "train",
           "--batch", str(batch), "--iters", str(iters),
           "--repeats", str(repeats)]
    try:
        proc = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True,
                              text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired as e:
        # one hung point must not abort the sweep: emit an error record
        # (like the rc!=0 path) and let later points run
        tail = (e.stderr or b"")
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
    return line


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--timeout", type=int, default=2400)
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "perf_ab_r04.jsonl"))
    args = ap.parse_args()

    points = [
        ("train_ssim=pallas_gs=pallas",
         {"SAN_TPU_SSIM": "pallas", "SAN_TPU_GRID_SAMPLE": "pallas"}),
        ("train_ssim=jnp_gs=pallas",
         {"SAN_TPU_SSIM": "jnp", "SAN_TPU_GRID_SAMPLE": "pallas"}),
        ("train_ssim=pallas_gs=jnp",
         {"SAN_TPU_SSIM": "pallas", "SAN_TPU_GRID_SAMPLE": "jnp"}),
    ]
    results = []
    for name, envo in points:
        rec = run_point(name, envo, args.batch, args.iters, args.repeats,
                        args.timeout)
        print(json.dumps(rec), flush=True)
        results.append(rec)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
    ok = [r for r in results if "value" in r and not r.get("suspect")]
    print(f"# {len(ok)}/{len(results)} points clean", file=sys.stderr)


if __name__ == "__main__":
    main()
