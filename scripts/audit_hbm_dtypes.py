#!/usr/bin/env python3
"""HBM activation-dtype audit of the flagship serving path (PERF.md lever).

Compiles the b128 serving forward for the attached backend and inventories
the LARGE buffers in the optimized HLO: any f32/c64 tensor at full spatial
extent on the hot path is a 2x HBM-traffic tax vs bf16. Reports, per dtype,
the count and total bytes of arrays >= --min_mb, plus the top offenders with
the instruction that produces them, so "activations are stored bf16" is a
checked fact rather than an assumption.

Usage: python scripts/audit_hbm_dtypes.py [--batch 128] [--min_mb 8]
       [--platform cpu]   (CPU compile is layout-approximate; default is the
                           attached backend, i.e. the real TPU when tunneled)
"""

import argparse
import json
import os
import re
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SHAPE_RE = re.compile(r"\b(f64|f32|bf16|f16|c64|c128|s32|u32|pred|s8|u8)"
                      r"\[([0-9,]*)\]")

BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "c64": 8, "c128": 16,
         "s32": 4, "u32": 4, "pred": 1, "s8": 1, "u8": 1}


def tensor_bytes(dtype, dims):
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * BYTES[dtype]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--min_mb", type=float, default=8.0)
    p.add_argument("--top", type=int, default=12)
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--trip", type=int, default=8,
                   help="trip count applied to buffers produced inside "
                        "while-loop bodies (the nn.scan cascade count; HLO "
                        "text does not carry the static trip count)")
    args = p.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from spatialalignmentnetwork_tpu.models.varnet import VarNet
    from spatialalignmentnetwork_tpu.ops.masks import make_mask
    from spatialalignmentnetwork_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    shape, sparsity = 320, 0.25
    num_low = int(shape * sparsity * 0.32)
    net = VarNet(num_cascades=8, sens_chans=8, sens_pools=4, chans=18,
                 pools=4, use_ref=True, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    B = args.batch
    k = (rng.standard_normal((B, 1, shape, shape))
         + 1j * rng.standard_normal((B, 1, shape, shape))).astype(np.complex64)
    pruned = make_mask("equispaced", shape, sparsity, seed=0).pruned
    mask = jnp.asarray(~pruned)
    ref = np.abs(rng.standard_normal((B, 1, shape, shape))).astype(np.float32)

    params = jax.eval_shape(
        lambda r: net.init(r, jnp.asarray(k), mask, jnp.asarray(ref), num_low),
        jax.random.PRNGKey(0),
    )
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params
    )

    fn = jax.jit(lambda p, k, m, r: net.apply(p, k, m, r, num_low))
    compiled = fn.lower(params, jnp.asarray(k), mask, jnp.asarray(ref)).compile()
    text = compiled.as_text()

    # pass 1: which computations are while-loop BODIES (scan cascades)?
    # their fusion outputs materialize once PER ITERATION, so their bytes
    # must be scaled by the trip count or the per-step traffic totals
    # understate scan-internal buffers by up to the cascade count.
    body_names = set(re.findall(r"body=%?([\w.\-]+)", text))

    min_bytes = args.min_mb * (1 << 20)
    by_dtype = defaultdict(lambda: [0, 0])   # dtype -> [count, bytes]
    offenders = []
    in_fused = False
    in_body = False
    for line in text.splitlines():
        stripped = line.strip()
        # instructions INSIDE a %fused_computation never materialize —
        # only the fusion call's output does. while-loop bodies (%region_*
        # scan cascades) DO materialize their fusion outputs per iteration,
        # so they stay counted — scaled by --trip (pass 1 above).
        if stripped.endswith("{") and ("(" in stripped or "ENTRY" in stripped):
            name = stripped.split()[0].lstrip("%")
            in_fused = name.startswith("fused_")
            in_body = name in body_names
            continue
        if in_fused:
            continue
        line = stripped
        # HLO instruction form: `%name = TYPE[dims]{layout} opcode(...)` —
        # the PRODUCED buffer's type is the first shape after '='; operand
        # mentions later on the line would double-count
        if "=" not in line:
            continue
        rhs = line.split("=", 1)[1].strip()
        # single `TYPE[dims]{layout} opcode(...)` or tuple
        # `(TYPE[..], TYPE[..]) opcode(...)`: the type region ends at the
        # opcode word; shapes mentioned there are what this instruction
        # PRODUCES (operands appear only inside opcode parens, not before)
        m_op = re.search(r"\}?\s+([a-z][a-z0-9_-]*)\(", rhs)
        type_region = rhs[: m_op.start()] if m_op else rhs
        op = m_op.group(1) if m_op else "?"
        # aliases / metadata — no bytes move
        if op in ("get-tuple-element", "tuple", "parameter", "bitcast",
                  "constant", "?"):
            continue
        for m_t in SHAPE_RE.finditer(type_region):
            dtype, dims = m_t.group(1), m_t.group(2)
            b = tensor_bytes(dtype, dims)
            # scan/while bodies execute --trip times per step: count their
            # produced buffers at trip-scaled bytes (the single-allocation
            # SIZE is unscaled, but the audit measures per-step TRAFFIC)
            b_traffic = b * args.trip if in_body else b
            if b_traffic < min_bytes:
                continue
            by_dtype[dtype][0] += 1
            by_dtype[dtype][1] += b_traffic
            offenders.append((b_traffic, dtype, dims,
                              (f"{args.trip}x " if in_body else "") + op[:60]))

    offenders.sort(reverse=True)
    mem = getattr(compiled, "memory_analysis", lambda: None)()
    out = {
        "metric": f"hbm_dtype_audit_b{B}",
        "platform": jax.devices()[0].platform,
        "min_mb": args.min_mb,
        "while_body_trip": args.trip,
        "by_dtype": {
            d: {"count": c, "MB": round(by_ / (1 << 20), 1)}
            for d, (c, by_) in sorted(by_dtype.items())
        },
        "top": [
            {"MB": round(b / (1 << 20), 1), "dtype": d, "dims": dims, "op": op}
            for b, d, dims, op in offenders[: args.top]
        ],
        # wide-dtype materializations are the audit's actual quarry
        "top_wide": [
            {"MB": round(b / (1 << 20), 1), "dtype": d, "dims": dims, "op": op}
            for b, d, dims, op in offenders
            if d in ("f32", "c64", "f64", "c128")
        ][: args.top],
    }
    if mem is not None:
        out["temp_alloc_MB"] = round(mem.temp_size_in_bytes / (1 << 20), 1)
        out["argument_MB"] = round(mem.argument_size_in_bytes / (1 << 20), 1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
