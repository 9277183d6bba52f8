#!/usr/bin/env python3
"""Per-fusion traffic x copy-bandwidth accounting of the serving step
(VERDICT r4 #3 — "close the last ~12% or prove it").

The relay backend's profiler returns no device-side events (probed
round 5), so per-fusion *measured* times are unavailable; this commits
the next-best checkable artifact: a static lower-bound time per top-level
fusion from the compiled HLO —

    t_lb(fusion) = (bytes_read + bytes_written) / BW_copy

with while-body (scan cascade) fusions trip-scaled, reads resolved
through a symbol table of every top-level buffer (get-tuple-element
aliases followed), and BW_copy the backend's measured XLA copy bandwidth
(397 GB/s on this tunnel, PERF.md round-2 probe). Output: the top fusions
by t_lb, sum(t_lb) vs the measured step time, and the implied fraction of
copy-path speed-of-light the compiled step achieves. If sum(t_lb) ~=
measured, the step is bandwidth-saturated end-to-end and the serving
number is at this backend's ceiling; a large gap names the fusions to
chase (they run below the copy path).

Usage: python scripts/serving_sol_accounting.py [--batch 128]
         [--bw_gbps 397] [--measured_ms 254] [--platform cpu]
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
ALIAS_OPS = ("get-tuple-element", "tuple", "parameter", "bitcast", "copy-done",
             "copy-start",
             # the while op itself moves nothing: its BODY's fusions are
             # counted per-iteration (trip-scaled) individually
             "while", "conditional")


def produced_bytes(type_region):
    total = 0
    for m in SHAPE_RE.finditer(type_region):
        n = 1
        for d in m.group(2).split(","):
            if d:
                n *= int(d)
        total += n * BYTES[m.group(1)]
    return total


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="recon", choices=["recon", "train"],
                   help="recon: the serving forward (default). train: the "
                        "full Mixed/Rec/... train step (--reg) — the same "
                        "per-fusion t_lb accounting applied to the round-5 "
                        "training campaign's compiled step")
    p.add_argument("--reg", default="Mixed")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--bw_gbps", type=float, default=397.0,
                   help="measured copy-path bandwidth of this backend")
    p.add_argument("--measured_ms", type=float, default=None,
                   help="measured full-step ms (bench.py --mode recon) for "
                        "the achieved-fraction line")
    p.add_argument("--trip", type=int, default=8)
    p.add_argument("--top", type=int, default=15)
    p.add_argument("--platform", type=str, default=None)
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
    rng = np.random.default_rng(0)
    B = args.batch

    if args.mode == "train":
        from spatialalignmentnetwork_tpu.engine.config import Config
        from spatialalignmentnetwork_tpu.engine.csmodel import CSModel

        cfg = Config(sparsity=sparsity, lr=1e-4, shape=shape, coils=1,
                     reg=args.reg, mask="equispaced", weight_smooth=1000.0,
                     weight_gan=0.1, weight_gan_sim=1.0, weight_sim=1.0,
                     use_amp=True)
        net = CSModel(cfg=cfg)
        mk = lambda s: (rng.standard_normal((B, 1, shape, shape))
                        + 1j * rng.standard_normal((B, 1, shape, shape))
                        ).astype(np.complex64)
        net.set_input(mk(0), mk(1))
        step = net._make_train_step(args.reg, net._batch[0].shape)
        text = step.lower(
            net.state, *net._batch, jax.random.PRNGKey(0)
        ).compile().as_text()
    else:
        num_low = int(shape * sparsity * 0.32)
        net = VarNet(num_cascades=8, sens_chans=8, sens_pools=4, chans=18,
                     pools=4, use_ref=True, dtype=jnp.bfloat16)
        k = (rng.standard_normal((B, 1, shape, shape))
             + 1j * rng.standard_normal((B, 1, shape, shape))
             ).astype(np.complex64)
        pruned = make_mask("equispaced", shape, sparsity, seed=0).pruned
        mask = jnp.asarray(~pruned)
        ref = np.abs(
            rng.standard_normal((B, 1, shape, shape))).astype(np.float32)

        params = jax.eval_shape(
            lambda r: net.init(r, jnp.asarray(k), mask, jnp.asarray(ref),
                               num_low),
            jax.random.PRNGKey(0),
        )
        params = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), params
        )
        fn = jax.jit(lambda p, kk, m, r: net.apply(p, kk, m, r, num_low))
        text = fn.lower(
            params, jnp.asarray(k), mask, jnp.asarray(ref)
        ).compile().as_text()

    body_names = set(re.findall(r"body=%?([\w.\-]+)", text))

    # ---- pass 1: symbol table of every top-level buffer's size ----------
    sizes = {}       # %name -> bytes (incl. aliases, for read resolution)
    entries = []     # (name, op, bytes_written, operand_names, in_body)
    in_fused = in_body = False
    for raw in text.splitlines():
        line = raw.strip()
        if line.endswith("{") and ("(" in line or "ENTRY" in line):
            name = line.split()[0].lstrip("%")
            in_fused = name.startswith("fused_")
            in_body = name in body_names
            continue
        if in_fused or "=" not in line:
            continue
        lhs, rhs = line.split("=", 1)
        name = lhs.strip().lstrip("%").strip()
        rhs = rhs.strip()
        m_op = re.search(r"\}?\s+([a-z][a-z0-9_-]*)\(", rhs)
        if not m_op:
            continue
        op = m_op.group(1)
        type_region = rhs[: m_op.start()]
        nbytes = produced_bytes(type_region)
        sizes[name] = nbytes
        # operand list = the BALANCED paren group right after the opcode;
        # attributes after it (kind=, calls=%fused_..., body=%region_...)
        # must not be mistaken for operands
        start = m_op.end() - 1
        depth, end = 0, len(rhs)
        for i in range(start, len(rhs)):
            if rhs[i] == "(":
                depth += 1
            elif rhs[i] == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        operands = re.findall(r"%([\w.\-]+)", rhs[start:end])
        entries.append((name, op, nbytes, operands, in_body))

    # ---- pass 2: traffic per materializing instruction ------------------
    rows = []
    totals = defaultdict(float)
    for name, op, nbytes, operands, body in entries:
        if op in ALIAS_OPS or op == "constant":
            continue
        reads = sum(sizes.get(o, 0) for o in operands)
        scale = args.trip if body else 1
        traffic = (nbytes + reads) * scale
        rows.append({
            "fusion": name, "op": op,
            "write_MB": round(nbytes * scale / 1e6, 1),
            "read_MB": round(reads * scale / 1e6, 1),
            "t_lb_ms": round(traffic / (args.bw_gbps * 1e9) * 1e3, 3),
            "trip_scaled": bool(body),
        })
        totals["write"] += nbytes * scale
        totals["read"] += reads * scale

    rows.sort(key=lambda r: -r["t_lb_ms"])
    t_lb_total_ms = (totals["write"] + totals["read"]) / (
        args.bw_gbps * 1e9) * 1e3

    out = {
        "metric": (f"train_{args.reg}_sol_accounting_b{B}"
                   if args.mode == "train"
                   else f"serving_sol_accounting_b{B}"),
        "platform": jax.devices()[0].platform,
        "bw_gbps": args.bw_gbps,
        "trip": args.trip,
        "total_write_GB": round(totals["write"] / 1e9, 2),
        "total_read_GB": round(totals["read"] / 1e9, 2),
        "t_lb_total_ms": round(t_lb_total_ms, 1),
        "top": rows[: args.top],
    }
    if args.measured_ms:
        out["measured_ms"] = args.measured_ms
        out["copy_sol_fraction"] = round(t_lb_total_ms / args.measured_ms, 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
