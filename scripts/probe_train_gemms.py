#!/usr/bin/env python3
"""On-chip per-pass conv probes for the TRAIN-step roofline (round 5).

scripts/train_sol.py bounds each GEMM pass (fwd / input-grad /
weight-grad) by the lane-utilization ceiling u = r8(K) * r128(N). This
probe measures what the backend actually achieves per pass on the train
step's dominant conv shapes, so the SOL gap (measured 1.24 steps/s vs
4.6 bound at b16 Mixed) can be split into "the model's u is optimistic
for pass X" vs "time lost outside the GEMMs".

Each probe times ONE pass in isolation with the readback-anchored
marginal-timing chain (utils/timing.py):
  fwd    y = conv(x, k)
  dgrad  x_bar = vjp of conv wrt x (transposed conv, K = cout*kh*kw)
  wgrad  k_bar = vjp of conv wrt k (batch-reduction GEMM, tiny output)

Shapes cover the five nets at b16 Mixed 320^2 (see utils/flops.py
*_convs): cascade UNet 18/36ch, STN LibUNet 32/64ch, NetG 64..512ch,
NetD 64..256ch.

Usage: python scripts/probe_train_gemms.py [--batch 16] [--iters 4]
         [--only name,...]
Prints one JSON line per (shape, pass) with achieved TF/s and the SOL
lane ceiling for that pass.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spatialalignmentnetwork_tpu.utils.timing import marginal_time  # noqa: E402


def _roundup(x, m):
    return ((int(x) + m - 1) // m) * m


def _util(k, n):
    return (k / _roundup(k, 8)) * (n / _roundup(n, 128))


# (name, H, W, cin, cout)  — all 3x3 SAME convs, the step's FLOP carriers
SHAPES = [
    ("casc18_320", 320, 320, 18, 18),   # VarNet cascade level-0 (x2 per unet)
    ("casc36_160", 160, 160, 36, 36),   # cascade level-1
    ("stn32_320", 320, 320, 32, 32),    # LibUNet outer
    ("stn64_160", 160, 160, 64, 64),    # LibUNet inner (the OOM-report conv)
    ("netg64_320", 320, 320, 64, 64),   # NetG outer
    ("netg128_160", 160, 160, 128, 128),
    ("netg256_80", 80, 80, 256, 256),
    ("netg512_40", 40, 40, 512, 512),   # lane-perfect: the control shape
    ("netd256_40", 40, 40, 256, 256),
    ("tiny8_32", 32, 32, 8, 8),         # smoke-test shape (--only tiny8_32)
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--peak", type=float, default=197.0)
    p.add_argument("--only", type=str, default=None)
    p.add_argument("--platform", type=str, default=None,
                   help="e.g. cpu for an off-chip smoke run")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from jax import lax

    only = set(args.only.split(",")) if args.only else None
    rng = np.random.default_rng(0)
    B = args.batch

    for name, H, W, cin, cout in SHAPES:
        if only and name not in only:
            continue
        x = jnp.asarray(rng.standard_normal(
            (B, H, W, cin)).astype(np.float32)).astype(jnp.bfloat16)
        k = jnp.asarray((rng.standard_normal(
            (3, 3, cin, cout)) * 0.1).astype(np.float32)).astype(jnp.bfloat16)
        dn = lax.conv_dimension_numbers(
            x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))

        def conv(xx, kk):
            return lax.conv_general_dilated(
                xx, kk, (1, 1), "SAME", dimension_numbers=dn)

        y = conv(x, k)
        flops = 2.0 * B * H * W * 9 * cin * cout

        # per-pass GEMM dims for the lane model (matches train_sol.py)
        dims = {
            "fwd": (9 * cin, cout),
            "dgrad": (9 * cout, cin),
            "wgrad": (9 * cin, cout),  # output tile [cin*9, cout]
        }

        _, vjp = jax.vjp(conv, x, k)

        passes = {
            # fwd: perturb x so the scan can't hoist the conv
            "fwd": (lambda xx: conv(xx, k), x, lambda o, c: o),
            # dgrad alone: conv of cotangent with transposed kernel
            "dgrad": (lambda ct: vjp(ct)[0], y, lambda o, c: o),
            # wgrad alone: cotangent x activations -> weight-shaped output;
            # re-broadcast the tiny output back to carrier shape via sum
            "wgrad": (lambda ct: vjp(ct)[1], y, None),
        }

        for pname, (fn, carrier, _) in passes.items():
            def make(n, fn=fn, carrier=carrier):
                @jax.jit
                def run(c0):
                    def body(c, _):
                        out = fn(c0 + (1e-30 * c[0, 0, 0, 0]).astype(c0.dtype))
                        s = jnp.sum(out.astype(jnp.float32))
                        return c + (1e-30 * s).astype(c.dtype), ()
                    c, _ = jax.lax.scan(body, c0, (), length=n)
                    return jnp.sum(c.astype(jnp.float32)[0, 0, 0])
                return run

            t = marginal_time(make, (carrier,), args.iters)
            kdim, ndim = dims[pname]
            u = _util(kdim, ndim)
            print(json.dumps({
                "probe": f"{name}:{pname}",
                "ms": round(t * 1e3, 3),
                "tflops": round(flops / t / 1e12, 2),
                "lane_ceiling_tflops": round(args.peak * u, 1),
                "frac_of_lane_ceiling": round(flops / t / 1e12
                                              / (args.peak * u), 3),
                "batch": B,
            }), flush=True)


if __name__ == "__main__":
    main()
