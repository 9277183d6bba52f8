#!/usr/bin/env python3
"""Split a paired-volume manifest into train/val/test CSVs.

The reference ships fixed split manifests
(`t1_t2_paired_6875_{train,val,test}.csv`, mirrored in data/manifests/);
for a fresh `brain_nii/` conversion those do not exist yet, so the
turnkey parity runner calls this to derive a deterministic by-volume
split from the converter's pairs.csv. Volumes (not slices) are the split
unit — the same subject must never straddle train and test.

Usage:
  python scripts/make_split_manifests.py pairs.csv out_dir \
      [--ratios 0.7 0.15 0.15] [--seed 0] [--prefix paired]
"""

import argparse
import os
import random
import sys


def split_rows(rows, ratios, seed):
    if abs(sum(ratios) - 1.0) > 1e-6:
        raise ValueError(f"ratios must sum to 1, got {ratios}")
    rows = list(rows)
    rng = random.Random(seed)
    rng.shuffle(rows)
    n = len(rows)
    n_train = int(round(ratios[0] * n))
    n_val = int(round(ratios[1] * n))
    n_train = min(n_train, n - 2)          # keep val/test non-empty
    n_val = max(1, min(n_val, n - n_train - 1))
    train = rows[:n_train]
    val = rows[n_train:n_train + n_val]
    test = rows[n_train + n_val:]
    if not train or not val or not test:
        raise ValueError(
            f"{n} volumes cannot fill a 3-way split; need at least 3"
        )
    return train, val, test


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("pairs_csv")
    p.add_argument("out_dir")
    p.add_argument("--ratios", type=float, nargs=3,
                   default=(0.7, 0.15, 0.15),
                   metavar=("TRAIN", "VAL", "TEST"))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--prefix", type=str, default="paired")
    args = p.parse_args(argv)

    with open(args.pairs_csv) as f:
        rows = [ln.strip() for ln in f if ln.strip()]
    train, val, test = split_rows(rows, tuple(args.ratios), args.seed)

    os.makedirs(args.out_dir, exist_ok=True)
    out = {}
    for name, part in (("train", train), ("val", val), ("test", test)):
        path = os.path.join(args.out_dir, f"{args.prefix}_{name}.csv")
        with open(path, "w") as f:
            f.write("\n".join(part) + "\n")
        out[name] = (path, len(part))
        print(f"{name}: {len(part)} volumes -> {path}")
    return out


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
