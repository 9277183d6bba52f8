#!/usr/bin/env python3
"""Benchmark: reconstruction slices/sec/chip on the flagship VarNet.

Measures the serving hot path (BASELINE.json north star): full-size
ref-guided VarNet (8 cascades, sens_chans 8, chans 18, pools 4) recon of
320x320 slices at 4x Cartesian undersampling on one chip. Prints ONE JSON
line: {"metric", "value", "unit", "vs_baseline"} with vs_baseline relative
to the 10,000 slices/sec/chip target.

Methodology: all timed iterations run INSIDE one jitted lax.scan whose
carry depends on each iteration's output (a serial chain XLA cannot elide
or overlap), so host-side dispatch overhead and async-queue artifacts are
amortized into a single dispatch + block. Timing is anchored on a DEVICE
-> HOST SCALAR READBACK of a checksum that depends on every iteration
(float() of the chain output), NOT on block_until_ready(): on relay/tunnel
backends block_until_ready can ack before execution finishes, while the
checksum bytes cannot exist until the work ran. The per-call fixed cost
(dispatch + readback RTT) is stripped by timing the chain at two lengths,
N and 2N, and reporting the marginal time (t_2N - t_N) / N.

Usage: python bench.py [--batch N] [--iters N] [--dtype bf16|f32]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# Dense bf16 matmul peak per chip, TFLOP/s (public specs). The guard uses
# these as a hard ceiling: any measurement implying more than 100% MFU is
# physically impossible and gets flagged "suspect" (e.g. a relay backend
# that acks dispatches without executing — see PERF.md).
_PEAK_TFLOPS_BY_KIND = {
    "v4": 275.0,
    "v5 lite": 197.0,
    "v5e": 197.0,
    "v5p": 459.0,
    "v6 lite": 918.0,
    "v6e": 918.0,
    "trillium": 918.0,
}
# Suspect threshold: a healthy backend can measure a hair past the nominal
# public peak (clock variance + marginal-timing noise — observed 100.8% on
# a true v5e), while a fabricating backend lands 15-50x past it. Flag only
# beyond a 20% band; physics still rules out anything sustained above it.
_SUSPECT_MARGIN = 1.2


def flag_if_impossible(result, measured_tflops, peak_tflops, what):
    """Mark a bench result dict suspect when a measurement exceeds the chip
    peak beyond the noise band. Returns the (mutated) dict."""
    if measured_tflops > _SUSPECT_MARGIN * peak_tflops:
        result["suspect"] = True
        result["vs_baseline"] = 0.0  # a physically impossible number is
        # evidence of a broken backend, not of beating the baseline
        result["suspect_reason"] = (
            f"{what} implies {measured_tflops:.0f} TFLOP/s on a "
            f"{peak_tflops:.0f} TFLOP/s chip: the backend did not actually "
            "execute the timed work"
        )
    return result
# FLOP accounting note: XLA's cost_analysis counts while/scan loop bodies
# ONCE regardless of trip count, so it under-reports the 8-cascade VarNet
# by ~6.7x. The primary count is analytic (utils/flops.py, mirrors the
# architecture); cost_analysis is still recorded as a cross-check field.


def _platform_peak_tflops():
    import jax

    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    for key, peak in _PEAK_TFLOPS_BY_KIND.items():
        if key in kind:
            return peak
    if d.platform == "cpu":
        return 10.0  # generous single-host CPU ceiling
    return 1000.0  # unknown accelerator: generous but finite


def _chain_flops(run_chain, *args):
    """Total analytical FLOPs of one chain call via XLA cost analysis."""
    try:
        analysis = run_chain.lower(*args).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        flops = float(analysis.get("flops", float("nan")))
        if np.isfinite(flops) and flops > 0:
            return flops, "xla_cost_analysis"
    except Exception:
        pass
    return float("nan"), "unavailable"


def _backend_probe_tflops(iters=24, size=4096):
    """Measured TFLOP/s of a serialized bf16 matmul chain with KNOWN FLOPs,
    anchored on a scalar readback (see module docstring: block_until_ready
    can ack early on relay backends; a checksum readback cannot).

    Two roles: (a) if even the readback-anchored probe exceeds the chip
    peak, the backend is fabricating results and every measurement is
    suspect; (b) on a healthy backend it reports the achievable matmul
    ceiling for context."""
    import jax
    import jax.numpy as jnp

    x = jax.random.normal(jax.random.PRNGKey(0), (size, size), jnp.bfloat16)

    def make_chain(n):
        @jax.jit
        def chain(x):
            def body(c, _):
                c = c @ c
                scale = jnp.maximum(jnp.max(jnp.abs(c)), 1e-20)
                return (c / scale).astype(jnp.bfloat16), ()

            c, _ = jax.lax.scan(body, x, (), length=n)
            return jnp.sum(c.astype(jnp.float32))

        return chain

    short, long = make_chain(iters), make_chain(2 * iters)
    float(short(x)), float(long(x))  # compile + warm
    t_short = min(_readback_time(short, x) for _ in range(3))
    t_long = min(_readback_time(long, x) for _ in range(3))
    marginal = max(t_long - t_short, 1e-9)
    return (2 * size**3 * iters) / marginal / 1e12


def _readback_time(fn, *args):
    """Wall time of fn(*args) anchored on a host readback of its scalar
    (shared implementation: utils/timing.py, also used by the scripts)."""
    from spatialalignmentnetwork_tpu.utils.timing import readback_time

    return readback_time(fn, *args)


def _last_recorded(metric, docs_dir=None):
    """Most recent committed measurement of this metric from the repo's A/B
    logs — context for a suspect artifact, NOT a substitute measurement."""
    import glob

    if docs_dir is None:
        docs_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "docs")
    best = None
    for path in sorted(glob.glob(
        os.path.join(docs_dir, "perf_ab_r*.jsonl")
    )):
        try:
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line.startswith("{"):
                        continue
                    try:
                        rec = json.loads(line)
                    except ValueError:
                        continue
                    # Presence, not truthiness: a committed 0.0 is a real
                    # measurement; suspect records are never context.
                    if (rec.get("metric") == metric
                            and rec.get("value") is not None
                            and not rec.get("suspect")):
                        best = {"value": rec["value"], "source": path}
        except OSError:
            continue
    return best


def _emit_unreachable(metric, why):
    out = {
        "metric": metric,
        "value": 0.0,
        "unit": "steps/s" if "steps_per_sec" in metric else "slices/s",
        "vs_baseline": 0.0,
        "suspect": True,
        "suspect_reason": why,
    }
    last = _last_recorded(metric)
    if last is not None:
        # context only: the last committed measurement of the same metric
        # on this backend (value stays 0.0/suspect — nothing ran NOW)
        out["last_recorded_value"] = last["value"]
        out["last_recorded_source"] = last["source"]
    print(json.dumps(out))


def guard_backend_alive(metric, probe_timeout_s=180, total_timeout_s=2700):
    """A dead relay backend hangs forever on the first dispatch (observed:
    tunnel outages where even jnp.sum(ones(8,8)) never returns). The
    benchmark must still produce ONE honest JSON line for the driver:
    (a) gate on a tiny-op probe with a timeout; (b) arm a whole-run
    watchdog that emits a suspect record and exits if the backend dies
    mid-measurement. Both paths exit 0 with suspect:true — an unreachable
    backend is a fact to record, not a crash."""
    import threading

    done = []

    def _probe():
        import jax.numpy as jnp

        done.append(float(jnp.sum(jnp.ones((8, 8)))))

    # observed outages are transient but can last >10 min: retry the probe
    # for ~15 min before declaring the backend dead
    attempts = 5
    for i in range(attempts):
        th = threading.Thread(target=_probe, daemon=True)
        th.start()
        th.join(probe_timeout_s)
        if done:
            break
        print(
            f"bench: backend probe attempt {i + 1}/{attempts} timed out "
            f"({probe_timeout_s}s), retrying...",
            file=sys.stderr, flush=True,
        )
    if not done:
        _emit_unreachable(
            metric,
            f"backend probe (8x8 sum) did not complete in {attempts}x"
            f"{probe_timeout_s}s: backend unreachable, nothing executed",
        )
        os._exit(0)

    # the cap is overridable (SAN_BENCH_WATCHDOG_S): a healthy-but-slow
    # platform (e.g. --platform cpu at the b128 TPU defaults) can
    # legitimately exceed it, and the verdict must not claim 'hung' as
    # the only possibility
    total_timeout_s = int(
        os.environ.get("SAN_BENCH_WATCHDOG_S", total_timeout_s)
    )

    def _watchdog():
        time.sleep(total_timeout_s)
        _emit_unreachable(
            metric,
            f"benchmark exceeded {total_timeout_s}s wall clock: backend "
            "hung mid-run OR this platform/config is too slow for the "
            "watchdog — partial timings discarded; shrink --batch/--iters "
            "or raise SAN_BENCH_WATCHDOG_S for a slow-but-healthy platform",
        )
        os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()


def _is_resource_error(e) -> bool:
    msg = str(e).upper()
    return any(s in msg for s in (
        "RESOURCE_EXHAUSTED", "OUT OF MEMORY", "OOM",
        "ALLOCATION", "EXCEEDS THE AMOUNT OF MEMORY",
    ))


def bench_train(args):
    """Full training-step throughput in the chosen regime (--reg, default
    Mixed: all 5 nets, both GAN passes, optimizer updates on device)."""
    import time as _time

    import jax
    import numpy as np
    from spatialalignmentnetwork_tpu.engine.config import Config
    from spatialalignmentnetwork_tpu.engine.csmodel import CSModel

    cfg = Config()
    cfg.sparsity = 0.25
    cfg.lr = 1e-4
    cfg.shape = 320
    cfg.coils = 1
    cfg.reg = args.reg
    cfg.mask = "equispaced"
    cfg.weight_smooth = 1000.0
    cfg.weight_gan = 0.1
    cfg.weight_gan_sim = 1.0
    cfg.weight_sim = 1.0
    cfg.use_amp = args.dtype == "bf16"
    net = CSModel(cfg=cfg)

    rng = np.random.default_rng(0)
    B = args.batch
    mk = lambda s: (
        rng.standard_normal((B, 1, 320, 320))
        + 1j * rng.standard_normal((B, 1, 320, 320))
    ).astype(np.complex64)
    net.set_input(mk(0), mk(1))
    net.update()  # compile
    jax.block_until_ready(net.state["params"])

    def checksum():
        # device->host readback of a freshly-produced param leaf: cannot
        # complete until every queued update actually executed (see module
        # docstring re block_until_ready on relay backends)
        leaf = jax.tree_util.tree_leaves(net.state["params"])[0]
        return float(np.asarray(leaf).ravel()[0])

    def timed(n):
        t0 = _time.perf_counter()
        for _ in range(n):
            net.update()
        checksum()
        return _time.perf_counter() - t0

    timed(2)  # warm
    # min-of-repeats on BOTH chain lengths: a single transient stall in
    # t_short would otherwise clamp the marginal to ~0 and print an
    # absurd throughput
    t_short = min(timed(args.iters) for _ in range(args.repeats))
    t_long = min(timed(2 * args.iters) for _ in range(args.repeats))
    dt = max(t_long - t_short, 1e-9)
    steps_per_sec = args.iters / dt

    probe = _backend_probe_tflops()
    peak = _platform_peak_tflops()
    # true analytic train-step FLOPs (utils/flops.py train_step_flops):
    # fwd+bwd of every net the regime trains, both D phases, remat
    # re-forward of the cascade scan — validated against XLA cost
    # analysis within 3-7% (tests/test_flops.py)
    import os as _os

    from spatialalignmentnetwork_tpu.ops.fft import active_fft_impl
    from spatialalignmentnetwork_tpu.utils.flops import train_step_flops

    from spatialalignmentnetwork_tpu.engine.csmodel import _remat_tg

    remat = _os.environ.get("SAN_TPU_REMAT", "full")
    step_flops, per_net = train_step_flops(
        args.reg, 320, coils=1, fft_impl=active_fft_impl(320, 320),
        remat=remat, remat_tg=_remat_tg(B),
    )
    implied_tflops = steps_per_sec * B * step_flops / 1e12
    mfu = implied_tflops / peak
    reg_tag = args.reg.lower().replace("-", "")
    result = {
        "metric": f"{reg_tag}_train_steps_per_sec_b{B}_320x320",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec * B / 10000.0, 4),
        "probe_tflops": round(probe, 2),
        "flops_per_slice": round(step_flops),
        "flops_source": "analytic_train_step(remat=%s, remat_tg=%s)" % (
            remat, _remat_tg(B)),
        "implied_tflops": round(implied_tflops, 2),
        "peak_tflops": peak,
        "mfu": round(mfu, 4),
    }
    flag_if_impossible(result, probe, peak, "matmul probe")
    flag_if_impossible(result, implied_tflops, peak, "measured train throughput")
    print(json.dumps(result))


def bench_input(args):
    """Host input-pipeline throughput: native C++ slice cache vs the python
    h5 loader, assembling normalized center-cropped complex64 batches."""
    import tempfile

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="bench_input_")
    try:
        _bench_input_run(args, rng, tmp)
    finally:
        # ~380 MB of synthetic h5 + caches per run; don't fill /tmp
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


def _bench_input_run(args, rng, tmp):
    import os
    import time as _time

    import h5py

    from spatialalignmentnetwork_tpu.data import native_cache as NC
    from spatialalignmentnetwork_tpu.data.paired_dataset import (
        get_paired_volume_datasets, ConcatDataset,
    )

    rows = []
    for v in range(4):
        for proto in ("T1", "T2"):
            img = rng.random((32, 352, 352)).astype(np.float32)
            with h5py.File(os.path.join(tmp, f"p{v}_{proto}.h5"), "w") as h5:
                h5.create_dataset("image", data=img)
                h5.attrs["max"] = float(img.max())
                h5.attrs["acquisition"] = proto
        rows.append(f"p{v}_T1.h5,p{v}_T2.h5")
    csv = os.path.join(tmp, "pairs.csv")
    with open(csv, "w") as f:
        f.write("\n".join(rows) + "\n")

    B, crop, iters = args.batch, 320, args.iters

    caches = NC.build_caches_from_csv(csv, ["T2", "T1"], tmp + "/cache")
    ds = NC.NativePairedSlices(caches, crop=crop)
    idx = rng.integers(0, len(ds), size=(iters, B))
    ds.batch(idx[0])  # warm page cache
    t0 = _time.perf_counter()
    for i in range(iters):
        ds.batch(idx[i])
    native_sps = B * iters / (_time.perf_counter() - t0)

    vols = get_paired_volume_datasets(csv, protocals=["T2", "T1"], crop=crop)
    cat = ConcatDataset(vols)
    t0 = _time.perf_counter()
    for i in range(iters):
        items = [cat[int(j)] for j in idx[i]]
        [np.stack([it[m] for it in items]) for m in range(2)]
    python_sps = B * iters / (_time.perf_counter() - t0)

    print(json.dumps({
        "metric": "input_pipeline_slices_per_sec_native_320",
        "value": round(native_sps, 1),
        "unit": "slices/s",
        "vs_baseline": round(native_sps / max(python_sps, 1e-9), 2),
    }))


def main():
    p = argparse.ArgumentParser()
    # default batch resolves per mode below: recon 128 (measured sweet
    # spot on v5e, docs/perf_ab_r02.jsonl — throughput rises to 128 and
    # plateaus), train 32 (remat backward fits a 16 GB chip there)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--dtype", type=str, default="bf16", choices=["bf16", "f32"])
    p.add_argument("--planar", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="planar-NHWC VarNet cascade layout (auto: the "
                        "SAN_TPU_PLANAR env lever, default off — measured "
                        "8%% slower than the complex-NCHW path at b128 on "
                        "the v5e, docs/perf_ab_r03.jsonl)")
    # default None: leave the SAN_TPU_FFT env setting (or 'auto') in
    # effect instead of silently clobbering it
    p.add_argument("--fft", type=str, default=None,
                   choices=["auto", "xla", "matmul"])
    p.add_argument("--s2d", type=int, default=None,
                   help="UNet levels executed in the space-to-depth layout "
                        "(models/s2d.py MXU lane lever); default: the "
                        "SAN_TPU_S2D env lever, else 0 — measured 24-35%% "
                        "slower on this bandwidth-bound backend "
                        "(docs/perf_ab_r03.jsonl)")
    # the sandbox sitecustomize overrides JAX_PLATFORMS, so an env var
    # cannot force a platform — mirror train/eval's --platform flag
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (e.g. cpu, tpu)")
    p.add_argument("--mode", type=str, default="recon",
                   choices=["recon", "train", "input"])
    p.add_argument("--reg", type=str, default="Mixed",
                   choices=["None", "Rec", "Mixed", "GAN-Only"],
                   help="training regime for --mode train (the staged "
                        "protocol spends most wall-clock in None/Rec; "
                        "commands_train_test.sh:32-38)")
    args = p.parse_args()
    if args.batch is None:
        args.batch = {"recon": 128, "train": 32, "input": 64}[args.mode]

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.mode == "input":
        bench_input(args)
        return

    import jax
    import jax.numpy as jnp
    from spatialalignmentnetwork_tpu.models.varnet import VarNet
    from spatialalignmentnetwork_tpu.ops.masks import make_mask
    from spatialalignmentnetwork_tpu.ops.fft import set_fft_impl
    from spatialalignmentnetwork_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    set_fft_impl(args.fft)
    guard_backend_alive(
        "recon_slices_per_sec_per_chip_320x320_4x"
        if args.mode == "recon"
        else "%s_train_steps_per_sec_b%d_320x320" % (
            args.reg.lower().replace("-", ""), args.batch)
    )
    if args.mode == "train":
        bench_train(args)
        return

    shape = 320
    sparsity = 0.25
    num_low = int(shape * sparsity * 0.32)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    # resolve exactly like the serving engine (csmodel.py): 'auto' defers
    # to the SAN_TPU_* env levers so `SAN_TPU_PLANAR=1 python bench.py`
    # benchmarks the same path a SAN_TPU_PLANAR=1 serving run executes
    from spatialalignmentnetwork_tpu.engine.csmodel import (
        _parse_bool_lever, _parse_level_lever,
    )

    planar = _parse_bool_lever(
        "--planar/SAN_TPU_PLANAR",
        os.environ.get("SAN_TPU_PLANAR", "auto")
        if args.planar == "auto" else args.planar,
        auto=False,
    )
    s2d = _parse_level_lever(
        "--s2d/SAN_TPU_S2D",
        os.environ.get("SAN_TPU_S2D", "auto")
        if args.s2d is None else args.s2d,
        auto=0,
    )
    net = VarNet(num_cascades=8, sens_chans=8, sens_pools=4, chans=18,
                 pools=4, use_ref=True, planar=planar, s2d_levels=s2d,
                 dtype=dtype)

    from spatialalignmentnetwork_tpu.utils.transfer import to_device

    rng = np.random.default_rng(0)
    B = args.batch
    k = to_device(
        (rng.standard_normal((B, 1, shape, shape))
         + 1j * rng.standard_normal((B, 1, shape, shape))).astype(np.complex64)
    )
    pruned = make_mask("equispaced", shape, sparsity, seed=0).pruned
    mask = jnp.asarray(~pruned)
    k = k * mask[None, None, None, :]
    ref = jnp.asarray(
        np.abs(rng.standard_normal((B, 1, shape, shape))).astype(np.float32)
    )

    params = jax.jit(
        lambda r, k, m, rf: net.init(r, k, m, rf, num_low)
    )(jax.random.PRNGKey(0), k, mask, ref)

    n_iters = args.iters

    def make_chain(length):
        @jax.jit
        def run_chain(params, k, mask, ref):
            def body(carry, _):
                out = net.apply(params, carry, mask, ref, num_low)
                # serialize: next input depends (negligibly) on this output
                # so XLA cannot drop, reorder, or overlap iterations
                carry = carry + (1e-30 * jnp.mean(out)).astype(carry.dtype)
                return carry, ()

            carry, _ = jax.lax.scan(body, k, (), length=length)
            # scalar checksum: the readback anchor that forces execution
            return jnp.sum(jnp.abs(carry)).astype(jnp.float32)

        return run_chain

    # robustness: halve the batch ONLY on resource exhaustion so the
    # benchmark degrades (loudly) on smaller chips; any other failure is a
    # real bug and must surface
    while True:
        try:
            run_short = make_chain(n_iters)
            run_long = make_chain(2 * n_iters)
            float(run_short(params, k, mask, ref))  # warm compile
            float(run_long(params, k, mask, ref))
            break
        except Exception as e:
            if not _is_resource_error(e) or B <= 1:
                raise
            B //= 2
            print(f"bench: resource exhausted, retrying at batch {B}",
                  file=sys.stderr)
            k, ref = k[:B], ref[:B]

    from spatialalignmentnetwork_tpu.ops.fft import active_fft_impl
    from spatialalignmentnetwork_tpu.utils.flops import varnet_flops

    # count the FFT work actually dispatched: the matmul-DFT does ~60x the
    # native FFT's FLOPs (it wins on wall-clock, not FLOPs) and MFU would
    # otherwise be understated by ~10%
    flops_per_slice = varnet_flops(
        shape, coils=1, num_cascades=8, sens_chans=8, sens_pools=4,
        chans=18, pools=4, use_ref=True,
        fft_impl=active_fft_impl(shape, shape),
    )
    flops_src = "analytic"
    # cross-check only; see the loop-body note at the top of this file
    flops_chain_xla, _ = _chain_flops(run_short, params, k, mask, ref)

    # marginal timing strips the per-call fixed cost (dispatch + readback
    # RTT); both chains are timed with the scalar-checksum anchor
    t_short = min(_readback_time(run_short, params, k, mask, ref)
                  for _ in range(args.repeats))
    t_long = min(_readback_time(run_long, params, k, mask, ref)
                 for _ in range(args.repeats))
    best = max(t_long - t_short, 1e-9)
    slices_per_sec = B * n_iters / best

    # plausibility guard: a result implying >100% MFU is physically
    # impossible — mark it suspect so a broken backend (e.g. a tunnel that
    # acks dispatches without executing) can never produce a clean number
    peak_tflops = _platform_peak_tflops()
    implied_tflops = slices_per_sec * flops_per_slice / 1e12
    mfu = implied_tflops / peak_tflops
    # analytic speed of light for this model on this chip at 100% MFU;
    # NOTE the BASELINE.md 10k-slices/s target exceeds it ~5x on v5e —
    # see PERF.md "north star reality" for the derivation
    sol = peak_tflops * 1e12 / flops_per_slice
    result = {
        "metric": "recon_slices_per_sec_per_chip_320x320_4x",
        "value": round(slices_per_sec, 2),
        "unit": "slices/s",
        "vs_baseline": round(slices_per_sec / 10000.0, 4),
        "flops_per_slice": round(flops_per_slice),
        "flops_source": flops_src,
        "flops_per_slice_xla_loop_body": (
            round(flops_chain_xla / (B * n_iters))
            if np.isfinite(flops_chain_xla) else None
        ),
        "implied_tflops": round(implied_tflops, 2),
        "peak_tflops": peak_tflops,
        "mfu": round(mfu, 4),
        "sol_slices_per_sec": round(sol, 1),
        "fraction_of_sol": round(slices_per_sec / sol, 4),
    }
    flag_if_impossible(result, implied_tflops, peak_tflops,
                       "measured throughput")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
