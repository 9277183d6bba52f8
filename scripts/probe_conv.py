#!/usr/bin/env python3
"""On-chip micro-probes for the VarNet serving roofline (round 3).

Times candidate formulations of the hot ops (18-channel conv, layout
transposes, complex pack/unpack, group norm, Pallas DMA) with the
readback-anchored marginal-timing methodology, to decide which levers the
planar-cascade redesign should pull on THIS backend.

Usage: python scripts/probe_conv.py [--batch N] [--iters N] [--only names]
Prints one JSON line per probe.
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))


from spatialalignmentnetwork_tpu.utils.timing import marginal_time  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--only", type=str, default=None,
                   help="comma-separated probe names")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    B, H, W, C = args.batch, 320, 320, 18
    rng = np.random.default_rng(0)
    x_nhwc = jnp.asarray(
        rng.standard_normal((B, H, W, C)).astype(np.float32)
    ).astype(jnp.bfloat16)
    k33 = jnp.asarray(
        rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)

    def chain(step, x0):
        def make(n):
            @jax.jit
            def run(x):
                def body(c, _):
                    out = step(c)
                    return out.astype(c.dtype).reshape(c.shape), ()
                c, _ = jax.lax.scan(body, x, (), length=n)
                return jnp.sum(c.astype(jnp.float32)[0, 0])
            return run
        return make, (x0,)

    results = {}
    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    dn = lax.conv_dimension_numbers(
        x_nhwc.shape, k33.shape, ("NHWC", "HWIO", "NHWC"))

    # -- 1. baseline XLA conv 18->18 NHWC bf16
    if want("conv_xla_nhwc"):
        f = lambda x: lax.conv_general_dilated(
            x, k33, (1, 1), "SAME", dimension_numbers=dn)
        make, a = chain(f, x_nhwc)
        results["conv_xla_nhwc"] = marginal_time(make, a, args.iters)

    # -- 2. conv with f32 accumulate out (preferred_element_type)
    if want("conv_xla_nhwc_f32acc"):
        f = lambda x: lax.conv_general_dilated(
            x, k33, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        make, a = chain(f, x_nhwc)
        results["conv_xla_nhwc_f32acc"] = marginal_time(make, a, args.iters)

    # -- 3. int8 conv (2x MXU peak if lowered to int8 systolic ops)
    if want("conv_int8"):
        xi = (x_nhwc.astype(jnp.float32) * 10).astype(jnp.int8)
        ki = (k33.astype(jnp.float32) * 10).astype(jnp.int8)
        def f(x):
            y = lax.conv_general_dilated(
                x, ki, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return y.astype(jnp.int8)
        make, a = chain(f, xi)
        results["conv_int8"] = marginal_time(make, a, args.iters)

    # -- 4. transpose NHWC<->NCHW round trip (the NormUnet boundary cost).
    # optimization_barrier between the two: without it the pair is the
    # identity permutation and XLA cancels it entirely (and any
    # elementwise op in between commutes with transposes, so it cannot
    # anchor them either) — the probe would time a no-op.
    if want("transpose_pair"):
        def f(x):
            t = jax.lax.optimization_barrier(jnp.transpose(x, (0, 3, 1, 2)))
            return jnp.transpose(t, (0, 2, 3, 1))
        make, a = chain(f, x_nhwc)
        results["transpose_pair"] = marginal_time(make, a, args.iters)

    # -- 5. complex pack/unpack round trip ([B,1,H,W]c64 <-> 2ch planar).
    # H2D goes through utils.transfer (complex64 DMA is UNIMPLEMENTED on
    # the relay backend); the barrier pins the concat so XLA's
    # slice-of-concat forwarding can't delete the pack being measured.
    if want("complex_roundtrip"):
        from spatialalignmentnetwork_tpu.utils.transfer import to_device

        xc = to_device(
            (rng.standard_normal((B, 1, H, W))
             + 1j * rng.standard_normal((B, 1, H, W))).astype(np.complex64))
        def f(x):
            pl = jnp.concatenate([x.real, x.imag], axis=1)
            pl = jax.lax.optimization_barrier(pl * 1.0000001)
            return pl[:, :1] + 1j * pl[:, 1:]
        def make(n):
            @jax.jit
            def run(x):
                def body(c, _):
                    return f(c), ()
                c, _ = jax.lax.scan(body, x, (), length=n)
                return jnp.sum(jnp.abs(c[0, 0]))
            return run
        results["complex_roundtrip"] = marginal_time(make, (xc,), args.iters)

    # -- 6. group-norm-2 style stats pass over [B,2,H,W] planar
    if want("group_norm2"):
        xp = jnp.concatenate(
            [x_nhwc[..., :1], x_nhwc[..., 1:2]], axis=-1).astype(jnp.float32)
        def f(x):
            g = x.reshape(B, -1, 2)
            mean = jnp.mean(g, axis=1)
            var = jnp.var(g, axis=1)
            return ((g - mean[:, None]) / jnp.sqrt(var[:, None] + 1e-6)
                    ).reshape(x.shape)
        make, a = chain(f, xp)
        results["group_norm2"] = marginal_time(make, a, args.iters)

    # -- 7. Pallas VMEM-blocked copy bandwidth (today's relay DMA health)
    if want("pallas_copy"):
        from jax.experimental import pallas as pl_
        from jax.experimental.pallas import tpu as pltpu

        big = jnp.asarray(
            rng.standard_normal((4096, 4096)).astype(np.float32))

        def kern(i_ref, o_ref):
            o_ref[:] = i_ref[:] * 2.0

        def copy_once(x):
            return pl_.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(big.shape, big.dtype),
                grid=(16,),
                in_specs=[pl_.BlockSpec(
                    (256, 4096), lambda i: (i, 0),
                    memory_space=pltpu.VMEM)],
                out_specs=pl_.BlockSpec(
                    (256, 4096), lambda i: (i, 0),
                    memory_space=pltpu.VMEM),
            )(x)
        make, a = chain(copy_once, big)
        t = marginal_time(make, a, args.iters)
        results["pallas_copy"] = t
        results["pallas_copy_gbps"] = 2 * big.size * 4 / t / 1e9

    # -- 8. XLA copy bandwidth control (same traffic, plain XLA op)
    if want("xla_copy"):
        big = jnp.asarray(
            rng.standard_normal((4096, 4096)).astype(np.float32))
        f = lambda x: x * 2.0
        make, a = chain(f, big)
        t = marginal_time(make, a, args.iters * 4)
        results["xla_copy"] = t
        results["xla_copy_gbps"] = 2 * big.size * 4 / t / 1e9

    conv_flops = 2 * B * H * W * 9 * C * C
    for name, t in results.items():
        if name.endswith("_gbps"):
            continue
        row = {"probe": name, "ms": round(t * 1e3, 3), "batch": B}
        if name.startswith("conv"):
            row["tflops"] = round(conv_flops / t / 1e12, 1)
        if f"{name}_gbps" in results:
            row["gbps"] = round(results[f"{name}_gbps"], 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
