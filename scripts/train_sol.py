#!/usr/bin/env python3
"""Speed-of-light model of the training step (VERDICT r4 #1 — "either
b16 Mixed >= ~1.5 steps/s or a serving-style SOL proof that the step is
at its ceiling").

Serving got its ceiling from one dominant conv shape (K=162/N=18 -> ~24
TF/s lane ceiling => ~574 slices/s). The train step has five nets with
wildly different channel widths, so its ceiling must be built per GEMM:
every MXU dispatch of the step (utils/flops.py *_convs inventories,
pinned to the analytic counters by tests/test_flops.py) x every pass the
step runs it in (fwd / input-grad / weight-grad, with the regime's
multipliers from train_step_flops), each bounded by

    t(gemm) = max( flops / (peak * u),  bytes / BW )

with the MXU lane utilization

    u = r8(K) * r128(N),   r_m(x) = x / roundup(x, m)

(K the contraction dim padded to the 8-deep sublane granule, N the
output-feature dim padded to the 128-lane granule). This u is an UPPER
bound on achievable utilization, so sum(t) is a true step-time lower
bound; it reproduces the measured serving hot conv within 10% (K=162,
N=18 -> u=13.6%, 26.8 TF/s ceiling vs 24.2 TF/s measured, PERF.md
round-2 decomposition). Norms, activations, window losses, and the
grid-sample warp are excluded (bandwidth already dominated by the conv
activations billed here) — exclusions only make the bound more
conservative as a ceiling.

Pass accounting per record (mirrors train_step_flops' multipliers, but
pass-exact where the scalar counter rounds: DFT/ew records take no
weight-grad pass — their operands are constants — where the counter
bills the cascade uniformly):

  trained net (T/G/R):  fwd x(2 if remat'd else 1) + dgrad + wgrad
  net_T regime None:    fwd only (stop_gradient)
  net_D:                G-phase fwd+dgrad, D-phase 2x(fwd+dgrad+wgrad)

Usage:
  python scripts/train_sol.py --regime Mixed --batch 16 \
      --measured_steps_per_sec 1.203 [--peak 197] [--bw_gbps 397]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from spatialalignmentnetwork_tpu.utils import flops as F  # noqa: E402


def _roundup(x, m):
    return ((int(x) + m - 1) // m) * m


def _util(k, n):
    return (k / _roundup(k, 8)) * (n / _roundup(n, 128))


def gemm_passes(rec, fwd_mult, with_wgrad, dgrad=True):
    """Yield (pass_name, flops, K, N, bytes_moved) per slice for one
    inventory record. bytes: activation reads+writes at the storage dtype
    (bf16 convs; f32 on the dft/ew k-space chain, PERF.md round-4 audit)."""
    kind = rec["kind"]
    d = 4.0 if kind in ("dft", "ew") else 2.0
    io = (rec["in_elems"] + rec["out_elems"]) * d
    if kind == "ew":  # traffic-only record
        for i in range(int(fwd_mult)):
            yield ("fwd", 0.0, 1, 1, io)
        if dgrad:
            yield ("dgrad", 0.0, 1, 1, io)
        return
    if kind == "convT":
        k_fwd, n_fwd = rec["cin"], 4 * rec["cout"]
        k_dg, n_dg = 4 * rec["cout"], rec["cin"]
    elif kind == "dft":
        k_fwd = n_fwd = k_dg = n_dg = rec["cout"]
    else:
        k_fwd, n_fwd = rec["cin"] * rec["kh"] * rec["kw"], rec["cout"]
        k_dg, n_dg = rec["cout"] * rec["kh"] * rec["kw"], rec["cin"]
    for i in range(int(fwd_mult)):
        yield ("fwd", rec["flops"], k_fwd, n_fwd, io)
    if dgrad:
        yield ("dgrad", rec["flops"], k_dg, n_dg, io)
    if with_wgrad and kind in ("conv", "convT"):
        # contraction over B*h*w (util ~1 on that axis); output tile is
        # [cin*kh*kw, cout] -> sublane/lane padding on the WEIGHT dims
        m_w = rec["cin"] * rec["kh"] * rec["kw"]
        if kind == "convT":
            m_w = rec["cin"] * 4
        yield ("wgrad", rec["flops"], m_w, rec["cout"], io)


def net_inventory(cfg, regime, remat, remat_tg):
    """[(net, records, fwd_mult, with_wgrad, dgrad, dispatch_count)]"""
    shape = cfg["shape"]
    out = []
    t_recs = F.stn_convs(shape)
    if regime == "None":
        out.append(("net_T", t_recs, 1, False, False, 1))
    else:
        out.append(("net_T", t_recs, 2 if remat_tg else 1, True, True, 1))
    if regime in ("None", "Rec", "Mixed"):
        sens, casc, edge = F.varnet_convs(
            shape, fft_impl=cfg["fft_impl"])
        out.append(("net_R/sens", sens, 1, True, True, 1))
        out.append(("net_R/cascades", casc, 2 if remat == "full" else 1,
                    True, True, cfg["num_cascades"]))
        out.append(("net_R/edge", edge, 1, True, True, 1))
    if regime in ("Mixed", "GAN-Only"):
        out.append(("net_G", F.netg_convs(shape),
                    2 if remat_tg else 1, True, True, 1))
        # G-phase: differentiated THROUGH (dgrad only); D-phase: fake+real
        d_recs = F.netd_convs(shape)
        out.append(("net_D/gphase", d_recs, 1, False, True, 1))
        out.append(("net_D/dphase", d_recs, 1, True, True, 2))
    return out


def serving_inventory(cfg):
    """Model-validation anchor: the serving forward (net_R only, fwd-only
    passes). bench.py --mode recon measured 254 ms at b128 (502 slices/s);
    this model must land near/below that for its train-step bound to be
    credible."""
    sens, casc, edge = F.varnet_convs(cfg["shape"], fft_impl=cfg["fft_impl"])
    return [("net_R/sens", sens, 1, False, False, 1),
            ("net_R/cascades", casc, 1, False, False, cfg["num_cascades"]),
            ("net_R/edge", edge, 1, False, False, 1)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--regime", default="Mixed",
                   choices=["None", "Rec", "Mixed", "GAN-Only"])
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--shape", type=int, default=320)
    p.add_argument("--peak", type=float, default=197.0,
                   help="chip bf16 peak TF/s (v5e public: 197)")
    p.add_argument("--bw_gbps", type=float, default=397.0,
                   help="measured copy bandwidth (tunnel: 397; v5e "
                        "datasheet: 819)")
    p.add_argument("--fft_impl", default="matmul", choices=["matmul", "xla"])
    p.add_argument("--remat", default="full", choices=["full", "dots"])
    p.add_argument("--remat_tg", action="store_true", default=None)
    p.add_argument("--measured_steps_per_sec", type=float, default=None)
    p.add_argument("--serving", action="store_true",
                   help="model the serving forward instead (validation "
                        "anchor vs the measured 254 ms @ b128)")
    args = p.parse_args()

    remat_tg = args.remat_tg
    if remat_tg is None:  # engine auto-on threshold (csmodel._remat_tg)
        remat_tg = args.batch >= 24

    cfg = {"shape": args.shape, "fft_impl": args.fft_impl,
           "num_cascades": 8}
    B = args.batch
    inv = (serving_inventory(cfg) if args.serving else
           net_inventory(cfg, args.regime, args.remat, remat_tg))
    rows = {}
    for net, recs, fwd_mult, wgrad, dgrad, count in inv:
        t_mxu = t_bw = t_lb = fl = 0.0
        for rec in recs:
            for _, flops, k, n, bts in gemm_passes(rec, fwd_mult, wgrad,
                                                   dgrad):
                tm = flops * B / (args.peak * 1e12 * max(_util(k, n), 1e-9))
                tb = bts * B / (args.bw_gbps * 1e9)
                t_mxu += tm
                t_bw += tb
                t_lb += max(tm, tb)
                fl += flops * B
        rows[net] = {"flops_G_per_step": round(fl * count / 1e9, 1),
                     "t_mxu_ms": round(t_mxu * count * 1e3, 2),
                     "t_bw_ms": round(t_bw * count * 1e3, 2),
                     "t_lb_ms": round(t_lb * count * 1e3, 2)}

    if not args.serving:
        # optimizer floor: adamw reads p/m/v/g, writes p/m/v (7 f32 passes)
        n_params = sum(
            r["kh"] * r["kw"] * r["cin"] * r["cout"]
            for _, recs, _, w, _, _ in inv if w
            for r in recs if r["kind"] in ("conv", "convT"))
        t_opt = 7.0 * n_params * 4 / (args.bw_gbps * 1e9)
        rows["optimizer"] = {"flops_G_per_step": 0.0, "t_mxu_ms": 0.0,
                             "t_bw_ms": round(t_opt * 1e3, 2),
                             "t_lb_ms": round(t_opt * 1e3, 2)}

    # The step-level bound allows full compute/DMA overlap ACROSS ops
    # (the classic roofline): t >= max(sum compute, sum traffic/BW).
    # sum(per-op max) is also reported — it assumes no cross-op overlap
    # and is an ESTIMATE, not a bound (the measured serving step beats it
    # by 13%: XLA overlaps the next fusion's DMA with the current MXU
    # work).
    tm_total = sum(r["t_mxu_ms"] for r in rows.values()) / 1e3
    tb_total = sum(r["t_bw_ms"] for r in rows.values()) / 1e3
    t_total = max(tm_total, tb_total)
    kind = "serving" if args.serving else f"train_sol_{args.regime}"
    out = {
        "metric": f"{kind}_sol_b{B}_{args.shape}" if args.serving
        else f"{kind}_b{B}_{args.shape}",
        "t_mxu_total_ms": round(tm_total * 1e3, 1),
        "t_bw_total_ms": round(tb_total * 1e3, 1),
        "t_noverlap_ms": round(
            sum(r["t_lb_ms"] for r in rows.values()), 1),
        "binding": "mxu" if tm_total >= tb_total else "bandwidth",
        "peak_tflops": args.peak,
        "bw_gbps": args.bw_gbps,
        "remat": args.remat,
        "remat_tg": remat_tg,
        "per_net": rows,
        "sol_step_ms": round(t_total * 1e3, 1),
        "sol_steps_per_sec": round(1.0 / t_total, 3),
        "sol_slices_per_sec": round(B / t_total, 1),
    }
    if args.measured_steps_per_sec:
        out["measured_steps_per_sec"] = args.measured_steps_per_sec
        out["fraction_of_sol"] = round(
            args.measured_steps_per_sec * t_total, 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
