#!/usr/bin/env python3
"""Component-level on-chip latency breakdown of the flagship recon path.

Times each stage of the serving VarNet in isolation (sens model, one
cascade's NormUnet, FFT pair, full forward) with the same readback-anchored
marginal-timing methodology as bench.py, to locate the bottleneck on real
hardware. Prints one JSON line per component.

Usage: python scripts/bench_components.py [--batch N] [--iters N]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))


def marginal_time(make_chain, args, iters, repeats=2):
    """(t_2N - t_N)/N via scalar-readback-anchored timing."""
    short, long = make_chain(iters), make_chain(2 * iters)
    float(short(*args)), float(long(*args))  # compile + warm

    def t(fn):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    return max(t(long) - t(short), 1e-9) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--dtype", type=str, default="bf16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from spatialalignmentnetwork_tpu.models.varnet import VarNet, SensitivityModel
    from spatialalignmentnetwork_tpu.models.unet import NormUnet
    from spatialalignmentnetwork_tpu.ops import fft as F
    from spatialalignmentnetwork_tpu.ops.masks import make_mask
    from spatialalignmentnetwork_tpu.utils.cache import enable_compilation_cache
    from spatialalignmentnetwork_tpu.utils.transfer import to_device

    enable_compilation_cache()
    shape, B = 320, args.batch
    num_low = int(shape * 0.25 * 0.32)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    rng = np.random.default_rng(0)
    k = to_device((rng.standard_normal((B, 1, shape, shape))
                   + 1j * rng.standard_normal((B, 1, shape, shape))
                   ).astype(np.complex64))
    pruned = make_mask("equispaced", shape, 0.25, seed=0).pruned
    mask = jnp.asarray(~pruned)
    k = k * mask[None, None, None, :]
    ref = jnp.asarray(np.abs(
        rng.standard_normal((B, 1, shape, shape))).astype(np.float32))

    def serial_chain(step, x0):
        """Wrap `step(x) -> x_like` into a length-n readback-anchored scan."""
        def make(n):
            @jax.jit
            def run(x):
                def body(c, _):
                    out = step(c)
                    return c + (1e-30 * jnp.mean(jnp.abs(out))).astype(c.dtype), ()
                c, _ = jax.lax.scan(body, x, (), length=n)
                return jnp.sum(jnp.abs(c)).astype(jnp.float32)
            return run
        return make, (x0,)

    results = {}

    # 1. FFT pair (ifft2 + fft2) on the k-space batch
    make, a = serial_chain(lambda c: F.fft2(F.ifft2(c)), k)
    results["fft_pair"] = marginal_time(make, a, args.iters * 4)

    # 2. Sensitivity model alone
    sm = SensitivityModel(chans=8, num_pools=4, dtype=dtype)
    ps = jax.jit(lambda r, kk: sm.init(r, kk, num_low))(jax.random.PRNGKey(0), k)
    make, a = serial_chain(
        lambda c: sm.apply(ps, c, num_low).astype(c.dtype), k)
    results["sens_model"] = marginal_time(make, a, args.iters)

    # 3. One NormUnet refinement (chans=18, pools=4, with ref channel)
    nu = NormUnet(chans=18, num_pools=4, use_ref=True, dtype=dtype)
    pn = jax.jit(lambda r, x, rf: nu.init(r, x, rf))(
        jax.random.PRNGKey(1), k, ref)
    make, a = serial_chain(lambda c: nu.apply(pn, c, ref), k)
    results["normunet_1x"] = marginal_time(make, a, args.iters)

    # 4. Full 8-cascade VarNet forward
    net = VarNet(num_cascades=8, sens_chans=8, sens_pools=4, chans=18,
                 pools=4, use_ref=True, dtype=dtype)
    pv = jax.jit(lambda r, kk, m, rf: net.init(r, kk, m, rf, num_low))(
        jax.random.PRNGKey(2), k, mask, ref)

    def make_full(n):
        @jax.jit
        def run(kk):
            def body(c, _):
                out = net.apply(pv, c, mask, ref, num_low)
                return c + (1e-30 * jnp.mean(out)).astype(c.dtype), ()
            c, _ = jax.lax.scan(body, kk, (), length=n)
            return jnp.sum(jnp.abs(c)).astype(jnp.float32)
        return run
    results["varnet_full"] = marginal_time(make_full, (k,), args.iters)

    for name, t in results.items():
        print(json.dumps({
            "component": name,
            "ms_per_call": round(t * 1e3, 3),
            "slices_per_sec": round(B / t, 1),
            "batch": B,
            "dtype": args.dtype,
        }))


if __name__ == "__main__":
    main()
