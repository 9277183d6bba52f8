#!/usr/bin/env python3
"""Compare two eval metrics JSONs (ours vs reference) for parity.

Each file is a list of per-volume scalar dicts as written by eval.py
--metric (both frameworks share the format). Prints per-metric means and
deltas and exits non-zero if PSNR differs by more than the threshold.

Usage: python scripts/compare_metrics.py ours.json theirs.json [--tol_db 0.1]
"""

import argparse
import json
import statistics
import sys


def load_means(path):
    with open(path) as f:
        rows = json.load(f)
    if isinstance(rows, dict):  # self-describing format: {meta, volumes}
        meta = rows.get("meta")
        if meta:
            print(f"{path} numerics: {meta}")
        rows = rows["volumes"]
    keys = set().union(*[set(r.keys()) for r in rows])
    return {
        k: statistics.mean([r[k] for r in rows if k in r]) for k in keys
    }, len(rows)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ours")
    p.add_argument("theirs")
    p.add_argument("--tol_db", type=float, default=0.1)
    args = p.parse_args()

    ours, n_o = load_means(args.ours)
    theirs, n_t = load_means(args.theirs)
    print(f"volumes: ours={n_o} theirs={n_t}")
    print(f"{'metric':<22}{'ours':>12}{'theirs':>12}{'delta':>12}")
    shared = sorted(set(ours) & set(theirs))
    for k in shared:
        print(f"{k:<22}{ours[k]:>12.5f}{theirs[k]:>12.5f}"
              f"{ours[k] - theirs[k]:>12.5f}")

    if "metric_PSNR" not in ours or "metric_PSNR" not in theirs:
        # a missing key must be a FAIL, not a silent pass — exiting 0
        # here would report parity that was never actually checked
        print("\nFAIL: metric_PSNR missing from "
              + ("ours " if "metric_PSNR" not in ours else "")
              + ("theirs" if "metric_PSNR" not in theirs else ""))
        return 1
    d = abs(ours["metric_PSNR"] - theirs["metric_PSNR"])
    verdict = "PASS" if d <= args.tol_db else "FAIL"
    print(f"\nPSNR delta {d:.4f} dB (tol {args.tol_db}) -> {verdict}")
    return 0 if d <= args.tol_db else 1


if __name__ == "__main__":
    sys.exit(main())
