"""Readback-anchored marginal timing — the project's one measurement
primitive.

On the tunneled TPU backend `block_until_ready` acks BEFORE execution
finishes, so honest wall time must anchor on a device->host scalar
readback (`float(...)`), and the per-call fixed cost (dispatch + readback
RTT, ~25 ms on the relay) must be stripped by timing two chain lengths
and taking the margin: (t_2N - t_N) / N. min-of-repeats on BOTH lengths
rejects scheduler noise (see bench.py for the derivation and the
physics/suspect guards built on top of this).

Shared by bench.py, scripts/bench_components.py, scripts/probe_conv.py —
previously three drifting copies.
"""

import time

__all__ = ["readback_time", "marginal_time"]


def readback_time(fn, *args):
    """Wall time of fn(*args) anchored on a host readback of its scalar."""
    t0 = time.perf_counter()
    float(fn(*args))
    return time.perf_counter() - t0


def marginal_time(make_chain, args, iters, repeats=3):
    """Per-iteration time of the chain returned by make_chain(n).

    make_chain(n) must return a callable whose n-iteration chain ends in
    a device scalar (the readback anchor). Both lengths are compiled and
    warmed before timing.
    """
    short, long = make_chain(iters), make_chain(2 * iters)
    float(short(*args)), float(long(*args))  # compile + warm

    t_short = min(readback_time(short, *args) for _ in range(repeats))
    t_long = min(readback_time(long, *args) for _ in range(repeats))
    return max(t_long - t_short, 1e-9) / iters
