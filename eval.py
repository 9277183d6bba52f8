#!/usr/bin/env python3
"""Repo-root evaluation entry point (CLI-compatible with the reference
eval.py invocation)."""

from spatialalignmentnetwork_tpu.engine.eval import main, build_parser

if __name__ == "__main__":
    main(build_parser())
