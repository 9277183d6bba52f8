"""Per-network complexity / latency / memory harness + trace capture.

Equivalent of the reference micro-benchmark (model.py:323-421, which uses
ptflops + CUDA-synced timing): for each of the five networks report
parameter count, analytical FLOPs (XLA cost analysis), mean step latency
over repeated synced calls, and live device memory. Also exposes
`trace(logdir)` wrapping jax.profiler for TensorBoard-viewable traces.

Usage: python -m spatialalignmentnetwork_tpu.utils.profiler [--shape 320]
"""

import argparse
import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(logdir):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure(fn, args, repeat=50, warmup=3):
    """Mean wall time per call, anchored on a device->host scalar readback.

    block_until_ready is NOT a valid anchor on the tunneled TPU backend
    (it acks before execution finishes — see bench.py, which this
    mirrors); a readback of the last output forces everything queued on
    the stream. Two run lengths strip the per-measurement fixed cost
    (dispatch + readback RTT) marginally, like bench.py."""
    import jax
    import jax.numpy as jnp

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(jnp.abs(leaf)))  # the readback anchor
        return time.perf_counter() - t0

    run(max(warmup, 1))
    t_short = min(run(repeat) for _ in range(2))
    t_long = min(run(2 * repeat) for _ in range(2))
    return max(t_long - t_short, 1e-9) / repeat


def flops_of(fn, *args):
    import jax

    try:
        lowered = jax.jit(fn).lower(*args)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return analysis.get("flops", float("nan"))
    except Exception:
        return float("nan")


def param_count(tree):
    import jax

    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(tree))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shape", type=int, default=320)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--repeat", type=int, default=50)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from ..models.varnet import VarNet
    from ..models.stn import SpatialTransformer
    from ..models.gan import NetG, NetD

    shape, B = args.shape, args.batch
    rng = np.random.default_rng(0)
    from .transfer import to_device

    full = to_device(
        (rng.random((B, 1, shape, shape))
         + 1j * rng.random((B, 1, shape, shape))).astype(np.complex64)
    )
    full_rss = jnp.abs(full)
    num_low = int(shape * 0.25 * 0.32)

    rows = []

    # NetD
    net_D = NetD()
    xd = jnp.concatenate([full_rss] * 2, axis=1)
    vD = jax.jit(
        lambda k, x: net_D.init({"params": k}, x, train=False)
    )(jax.random.PRNGKey(0), xd)
    fD = jax.jit(lambda v, x: net_D.apply(v, x, train=False))
    rows.append(("NetD", param_count(vD["params"]),
                 flops_of(lambda v, x: net_D.apply(v, x, train=False), vD, xd),
                 measure(fD, (vD, xd), args.repeat)))

    # NetG
    net_G = NetG()
    vG = jax.jit(
        lambda k, x: net_G.init({"params": k}, x, train=False)
    )(jax.random.PRNGKey(1), full_rss)
    fG = jax.jit(lambda v, x: net_G.apply(v, x, train=False))
    rows.append(("NetG", param_count(vG["params"]),
                 flops_of(lambda v, x: net_G.apply(v, x, train=False), vG, full_rss),
                 measure(fG, (vG, full_rss), args.repeat)))

    # NetT
    net_T = SpatialTransformer(channels=1)
    vT = jax.jit(
        lambda k, a, b: net_T.init({"params": k}, a, b, train=False)
    )(jax.random.PRNGKey(2), full_rss, full_rss)
    fT = jax.jit(lambda v, a, b: net_T.apply(v, a, b, train=False))
    rows.append(("NetT", param_count(vT["params"]),
                 flops_of(lambda v, a, b: net_T.apply(v, a, b, train=False),
                          vT, full_rss, full_rss),
                 measure(fT, (vT, full_rss, full_rss), args.repeat)))

    # NetR
    net_R = VarNet(num_cascades=8, sens_chans=8, sens_pools=4, chans=18,
                   pools=4, use_ref=True)
    mask = jnp.ones(shape, bool)
    vR = jax.jit(
        lambda k, kc, m, r: net_R.init(k, kc, m, r, num_low)
    )(jax.random.PRNGKey(3), full, mask, full_rss)
    fR = jax.jit(lambda v, k, m, r: net_R.apply(v, k, m, r, num_low))
    rows.append(("NetR", param_count(vR["params"]),
                 flops_of(lambda v, k, m, r: net_R.apply(v, k, m, r, num_low),
                          vR, full, mask, full_rss),
                 measure(fR, (vR, full, mask, full_rss), args.repeat)))

    for name, params, flops, latency in rows:
        gmacs = flops / 2 / 1e9 if np.isfinite(flops) else float("nan")
        print(f"{name}: {gmacs:.2f} GMac; {params/1e6:.2f} M parameters; "
              f"{latency*1000:.2f} ms time")


if __name__ == "__main__":
    main()
