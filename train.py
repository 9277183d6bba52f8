#!/usr/bin/env python3
"""Repo-root training entry point (CLI-compatible with the reference
train.py invocation, see commands_train_test.sh)."""

from spatialalignmentnetwork_tpu.engine.train import main, build_parser

if __name__ == "__main__":
    main(build_parser().parse_args())
