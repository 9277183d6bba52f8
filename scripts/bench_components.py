#!/usr/bin/env python3
"""Component-level on-chip latency breakdown of the flagship recon path.

Times each stage of the serving VarNet in isolation (sens model, one
cascade's NormUnet, FFT pair, full forward) with the same readback-anchored
marginal-timing methodology as bench.py, to locate the bottleneck on real
hardware. Prints one JSON line per component.

`--nets` switches to the per-network complexity report (the reference's
ptflops harness, model.py:323-421): params / GMACs / latency / compiled
memory for each of net_D, net_G, net_T, net_R at reference scale.

Usage: python scripts/bench_components.py [--batch N] [--iters N] [--nets]
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))


from spatialalignmentnetwork_tpu.utils.timing import marginal_time  # noqa: E402


def per_network_report(args):
    """Per-net params/MACs/latency/memory (reference model.py:323-421).

    MACs: XLA cost analysis for D/G/T (no scan in those nets, so the count
    is exact); the analytic count for the scanned VarNet (utils/flops.py —
    XLA counts scan bodies once regardless of trip count).
    """
    import jax
    import jax.numpy as jnp
    from spatialalignmentnetwork_tpu.engine.config import Config
    from spatialalignmentnetwork_tpu.engine.csmodel import CSModel
    from spatialalignmentnetwork_tpu.utils import flops as flops_lib
    from spatialalignmentnetwork_tpu.utils.cache import enable_compilation_cache
    from spatialalignmentnetwork_tpu.utils.transfer import to_device
    from spatialalignmentnetwork_tpu.ops import fft as F

    enable_compilation_cache()
    shape, B = args.shape, args.batch
    cfg = Config(sparsity=0.25, lr=1e-4, shape=shape, coils=1, reg="Mixed",
                 mask="equispaced", weight_smooth=1000.0, weight_gan=0.1,
                 weight_gan_sim=1.0, weight_sim=1.0,
                 use_amp=(args.dtype == "bf16"))
    if args.tiny:  # CI-scale architectures (the report shape, not the data)
        cfg.net_G_layers = [4, 8]
        cfg.net_D_blocks = [[4], [8]]
        cfg.net_T_layers = [4, 8]
        cfg.net_R_cascades = 2
        cfg.net_R_chans = 4
        cfg.net_R_sens_chans = 4
        cfg.net_R_pools = 2
        cfg.net_R_sens_pools = 2
    net = CSModel(cfg=cfg)
    net.eval()
    params = net.state["params"]
    stats = net.state["stats"]

    rng = np.random.default_rng(0)
    img = to_device(np.abs(rng.standard_normal(
        (B, 1, shape, shape))).astype(np.float32))
    img2 = to_device(np.abs(rng.standard_normal(
        (B, 1, shape, shape))).astype(np.float32))
    k = to_device((rng.standard_normal((B, 1, shape, shape))
                   + 1j * rng.standard_normal((B, 1, shape, shape))
                   ).astype(np.complex64))
    pruned = net.state["pruned"]
    k = k * jnp.logical_not(pruned)[None, None, None, :]

    runs = {
        "net_D": (lambda d: net._apply_D(
            params["net_D"], stats["net_D"], d, False)[0],
            (jnp.concatenate([img, img2], axis=1),)),
        "net_G": (lambda g: net._apply_G(
            params["net_G"], stats["net_G"], g, False)[0],
            (img,)),
        "net_T": (lambda m, f: net._apply_T(
            params["net_T"], stats["net_T"], m, f, False)[0],
            (img, img2)),
        "net_R": (lambda kk: net._forward_R(
            params["net_R"], kk, pruned, img), (k,)),
    }
    analytic_macs = {
        "net_R": flops_lib.varnet_flops(
            shape,
            num_cascades=cfg.get("net_R_cascades", 8),
            sens_chans=cfg.get("net_R_sens_chans", 8),
            sens_pools=cfg.get("net_R_sens_pools", 4),
            chans=cfg.get("net_R_chans", 18),
            pools=cfg.get("net_R_pools", 4),
            fft_impl=F.active_fft_impl(shape, shape),
        ) / 2.0,
    }

    for name, (fn, inputs) in runs.items():
        n_params = sum(
            int(np.prod(np.shape(x)))
            for x in jax.tree_util.tree_leaves(params[name])
        )
        jfn = jax.jit(fn)
        lowered = jfn.lower(*inputs)
        compiled = lowered.compile()
        cost = compiled.cost_analysis() or {}
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0] if cost else {}
        if name in analytic_macs:
            gmacs = analytic_macs[name] / 1e9
            macs_src = "analytic"
        else:
            gmacs = float(cost.get("flops", 0.0)) / 2.0 / B / 1e9
            macs_src = "xla_cost_analysis"
        try:
            mem = compiled.memory_analysis()
            peak_bytes = int(
                getattr(mem, "temp_size_in_bytes", 0)
                + getattr(mem, "output_size_in_bytes", 0)
            )
        except Exception:
            peak_bytes = None

        def make(n, fn=fn):
            @jax.jit
            def run(*xs):
                def body(c, _):
                    # thread the carry into the input so the call is not
                    # loop-invariant (XLA would hoist it out of the scan)
                    x0 = xs[0] + (1e-30 * c).astype(xs[0].dtype)
                    out = fn(x0, *xs[1:])
                    return c + jnp.mean(jnp.abs(out)).astype(jnp.float32), ()
                c, _ = jax.lax.scan(body, jnp.float32(0.0), (), length=n)
                return c
            return run

        t = marginal_time(make, inputs, args.iters)
        print(json.dumps({
            "net": name,
            "params": n_params,
            "gmacs_per_slice": round(gmacs, 6),
            "macs_source": macs_src,
            "ms_per_call": round(t * 1e3, 3),
            "slices_per_sec": round(B / t, 1),
            "compiled_bytes": peak_bytes,
            "batch": B,
            "dtype": args.dtype,
        }))


def per_network_train_report(args):
    """Per-net TRAINING cost in isolation: fwd+bwd latency of each network
    under exactly the differentiation pattern the Mixed step applies to it
    (utils/flops.py train_step_flops docstring; reference model.py:193-263):

      net_T      3x fwd   value_and_grad wrt params (train-mode, BN stats)
      net_G      3x fwd   value_and_grad wrt params
      net_D_gph  2x fwd   grad wrt the INPUT image (G-phase: differentiated
                          through, not wrt — forwardD D_loss=False)
      net_D_dph  6x fwd   value_and_grad wrt params of fake AND real passes
      net_R      3-4x fwd value_and_grad wrt params (cascade remat per
                          SAN_TPU_REMAT, models/varnet.py:27-47)
      optimizer  --       the 5-net adamw update alone (precomputed grads)

    The rows sum to a 'where the time goes' decomposition of the full
    Mixed step (bench.py --mode train measures the assembled step;
    PERF.md round-5 carries the table)."""
    import jax
    import jax.numpy as jnp
    import optax
    from spatialalignmentnetwork_tpu.engine.config import Config
    from spatialalignmentnetwork_tpu.engine.csmodel import CSModel, NET_NAMES
    from spatialalignmentnetwork_tpu.utils.cache import enable_compilation_cache
    from spatialalignmentnetwork_tpu.utils.transfer import to_device

    enable_compilation_cache()
    shape, B = args.shape, args.batch
    cfg = Config(sparsity=0.25, lr=1e-4, shape=shape, coils=1, reg="Mixed",
                 mask="equispaced", weight_smooth=1000.0, weight_gan=0.1,
                 weight_gan_sim=1.0, weight_sim=1.0,
                 use_amp=(args.dtype == "bf16"))
    if args.tiny:  # CI-scale smoke (same shrink set as per_network_report)
        cfg.net_G_layers = [4, 8]
        cfg.net_D_blocks = [[4], [8]]
        cfg.net_T_layers = [4, 8]
        cfg.net_R_cascades = 2
        cfg.net_R_chans = 4
        cfg.net_R_sens_chans = 4
        cfg.net_R_pools = 2
        cfg.net_R_sens_pools = 2
    net = CSModel(cfg=cfg)
    params, stats = net.state["params"], net.state["stats"]
    pruned = net.state["pruned"]

    rng = np.random.default_rng(0)
    img = to_device(np.abs(rng.standard_normal(
        (B, 1, shape, shape))).astype(np.float32))
    img2 = to_device(np.abs(rng.standard_normal(
        (B, 1, shape, shape))).astype(np.float32))
    k = to_device((rng.standard_normal((B, 1, shape, shape))
                   + 1j * rng.standard_normal((B, 1, shape, shape))
                   ).astype(np.complex64))
    k = k * jnp.logical_not(pruned)[None, None, None, :]

    def t_loss(pT, a, b):
        (offset, grid), _ = net.net_T.apply(
            {"params": pT, "batch_stats": stats["net_T"]}, a, b,
            train=True, mutable=["batch_stats"])
        return jnp.mean(jnp.abs(offset)) + jnp.mean(jnp.abs(grid))

    def g_loss(pG, x):
        out, _ = net.net_G.apply(
            {"params": pG, "batch_stats": stats["net_G"]}, x,
            train=True, mutable=["batch_stats"])
        return jnp.mean(jnp.abs(out))

    def d_of(pD, x):
        out, _ = net.net_D.apply(
            {"params": pD, "batch_stats": stats["net_D"]}, x,
            train=True, mutable=["batch_stats"])
        return jnp.mean(out)

    def r_loss(pR, kk):
        # train=True: measure the layout the train step actually runs
        # (s2d at bf16 since round 5 — csmodel.build s2d_train)
        return jnp.mean(jnp.abs(net._forward_R(pR, kk, pruned, img,
                                               train=True)))

    d_in = jnp.concatenate([img, img2], axis=1)

    rows = {
        # (fn producing a SCALAR whose computation is the fwd+bwd, inputs)
        "net_T": (lambda a, b: jnp.mean(jax.tree_util.tree_leaves(
            jax.value_and_grad(t_loss)(params["net_T"], a, b)[1])[0]),
            (img, img2)),
        "net_G": (lambda x: jnp.mean(jax.tree_util.tree_leaves(
            jax.value_and_grad(g_loss)(params["net_G"], x)[1])[0]),
            (img,)),
        "net_D_gphase": (lambda x: jnp.mean(
            jax.grad(lambda xx: d_of(params["net_D"], xx))(x)),
            (d_in,)),
        "net_D_dphase": (lambda x: jnp.mean(jax.tree_util.tree_leaves(
            jax.value_and_grad(
                lambda pD: d_of(pD, x) + d_of(pD, x[:, ::-1]))(
                    params["net_D"])[1])[0]),
            (d_in,)),
        "net_R": (lambda kk: jnp.mean(jax.tree_util.tree_leaves(
            jax.value_and_grad(r_loss)(params["net_R"], kk)[1])[0]),
            (k,)),
    }

    # ---- glue rows: everything in the step that is NOT a net ----------
    # (round-5 finding: the five nets + optimizer sum to ~540 ms of the
    # ~830 ms b16 Mixed step; these rows attribute the residue)
    from spatialalignmentnetwork_tpu.models.stn import (
        warp as warp_fn, gradient_loss)
    from spatialalignmentnetwork_tpu.ops.ssim import ssimloss

    kc = to_device((rng.standard_normal((B, 1, shape, shape))
                    + 1j * rng.standard_normal((B, 1, shape, shape))
                    ).astype(np.complex64))
    grid0 = jnp.zeros((B, shape, shape, 2), jnp.float32)
    offs0 = jnp.zeros((B, shape, shape, 2), jnp.float32)

    def prepare_only(a, b):
        env = net._prepare(a, b, pruned)
        return (jnp.mean(env["img_full_rss"])
                + jnp.mean(env["img_sampled_rss"])
                + jnp.mean(env["img_aux_rss"])
                + jnp.mean(jnp.abs(env["img_sampled"])))

    def warp_loss(g, a):
        return jnp.mean(jnp.abs(warp_fn(a, g)))

    def ssim_pair(a, b):
        return ssimloss(a, b)

    rows_glue = {
        "prepare(fft+mask+rss)": (prepare_only, (kc, kc)),
        "warp_fwd_bwd": (lambda g, a: jnp.mean(
            jax.grad(warp_loss, argnums=(0, 1))(g, a)[0]), (grid0, img)),
        "ssim_fwd_bwd": (lambda a, b: jnp.mean(
            jax.grad(ssim_pair, argnums=(0, 1))(a, b)[0]), (img, img2)),
        "smooth_fwd_bwd": (lambda o: jnp.mean(
            jax.grad(lambda x: gradient_loss(x))(o)), (offs0,)),
    }
    rows.update(rows_glue)

    # the bare 5-net adamw update, unit grads (optimizer cost floor)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    def opt_only(g):
        new = {}
        for name in NET_NAMES:
            updates, _ = net.tx[name].update(
                g[name], net.state["opt"][name], params[name])
            new[name] = optax.apply_updates(params[name], updates)
        return jnp.mean(jax.tree_util.tree_leaves(new["net_R"])[0])

    rows["optimizer"] = (opt_only, (grads,))

    for name, (fn, inputs) in rows.items():
        def make(n, fn=fn):
            @jax.jit
            def run(*xs):
                def body(c, _):
                    x0 = jax.tree_util.tree_map(
                        lambda t: t + (1e-30 * c).astype(t.dtype), xs[0])
                    out = fn(x0, *xs[1:])
                    return c + out.astype(jnp.float32), ()
                c, _ = jax.lax.scan(body, jnp.float32(0.0), (), length=n)
                return c
            return run

        t = marginal_time(make, inputs, args.iters)
        print(json.dumps({
            "component": name,
            "mode": "train_fwd_bwd",
            "ms_per_call": round(t * 1e3, 3),
            "slices_per_sec": round(B / t, 1),
            "batch": B,
            "dtype": args.dtype,
        }), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--dtype", type=str, default="bf16")
    p.add_argument("--nets", action="store_true",
                   help="per-network params/MACs/latency report")
    p.add_argument("--train_nets", action="store_true",
                   help="per-network TRAIN fwd+bwd latency decomposition")
    p.add_argument("--shape", type=int, default=320,
                   help="slice resolution for --nets")
    p.add_argument("--tiny", action="store_true",
                   help="CI-scale architectures for --nets")
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (sitecustomize overrides the "
                        "JAX_PLATFORMS env var in this sandbox)")
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.nets:
        per_network_report(args)
        return
    if args.train_nets:
        per_network_train_report(args)
        return

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
