"""Training CLI mirroring the reference train.py flag surface.

Flow (reference train.py:61-315): build Config from flags, construct/resume
CSModel (with partial `--load_nets` warm-starting for the staged protocol),
build paired-volume loaders (train crops to 1.1x then augments and
center-crops back), run the epoch loop with per-iteration jitted train
steps, TensorBoard scalars/histograms every 50 iters, image grids every
100/1000, checkpoints every 1000/5000, per-epoch validation with
best-checkpoint tracking and `--intel_stop` early stopping.

TPU-native differences: augmentation + center-crop run on device inside a
jitted preprocessing function; RNG is explicit; device transfer is a single
host->HBM copy per batch.
"""

import os
import sys
import glob
import time
import shutil
import statistics
import argparse

import numpy as np
import jax
import jax.numpy as jnp

from ..data.paired_dataset import get_paired_volume_datasets, ConcatDataset
from ..data.loader import Loader, Prefetch
from ..data.augment import augment_batch
from ..ops.crop import center_crop
from ..utils.visualize import save_image
from ..utils.transfer import to_device
from .config import Config
from .csmodel import CSModel

AUG_POLICIES = ("None", "Rigid", "BSpline", "PBSpline")


def _preprocess(policy, shape):
    """Jitted device-side augment + center-crop stage."""

    @jax.jit
    def run(batch, key):
        batch = augment_batch(policy, list(batch), key)
        return [center_crop(x, (shape, shape)) for x in batch]

    return run


def build_cfg(args) -> Config:
    cfg = Config()
    cfg.sparsity = args.sparsity
    cfg.lr = args.lr
    cfg.shape = args.crop
    cfg.coils = args.coils
    cfg.reg = args.reg
    cfg.mask = args.mask
    cfg.weight_smooth = args.smooth_weight
    cfg.weight_gan = args.gan_weight
    cfg.weight_gan_sim = args.gan_sim_weight
    cfg.weight_sim = args.sim_weight
    cfg.use_amp = args.use_amp
    if getattr(args, "grad_accum", 1) > 1:
        cfg.grad_accum = args.grad_accum
    if getattr(args, "learn_mask", False):
        # LOUPE live mask learning: undersampling in the train step uses
        # the differentiable soft-sigmoid sample so gradients reach the
        # mask logits (csmodel._prepare; reference masks.py:185-188)
        assert args.mask == "loupe", "--learn_mask requires --mask loupe"
        if args.reg == "GAN-Only":
            # GRAD_NETS gives net_mask gradients only in regimes that run
            # net_R; under GAN-Only the soft stochastic sampling would
            # resample fresh k-space noise every step while the logits
            # stay frozen — 'learning' would be silently inert
            raise SystemExit(
                "--learn_mask is inert under --reg GAN-Only (no recon "
                "loss reaches the mask logits); use None/Rec/Mixed"
            )
        cfg.learn_mask = True
    if getattr(args, "net_scale", "full") == "tiny":
        # reduced architecture for CI / smoke runs; persisted in the ckpt
        # config so eval rebuilds the same scale
        cfg.net_G_layers = (8, 16, 16)
        cfg.net_D_blocks = ((8,) * 2, (16,) * 2)
        cfg.net_T_layers = (8, 16, 16)
        cfg.net_R_cascades = 2
        cfg.net_R_chans = 4
        cfg.net_R_sens_chans = 4
        cfg.net_R_pools = 2
        cfg.net_R_sens_pools = 2
    return cfg


def main(args):
    if getattr(args, "platform", None):
        # must happen before the first backend touch; overrides both
        # JAX_PLATFORMS and any sitecustomize-forced platform
        jax.config.update("jax_platforms", args.platform)
    if getattr(args, "matmul_precision", None):
        # 'highest' keeps convs/matmuls at true f32 on TPU (default
        # truncates f32 operands to bf16) — the knob for 0.1 dB parity runs
        jax.config.update(
            "jax_default_matmul_precision", args.matmul_precision
        )
    if getattr(args, "fft", None) or (
        getattr(args, "matmul_precision", None) == "highest"
    ):
        from ..ops.fft import set_fft_impl

        # --matmul_precision highest is the strict-parity knob: it must
        # also pin the matmul-DFT to f32-exact accumulation, or the
        # TPU-default DFT path would silently keep its bf16x3 rounding
        set_fft_impl(
            getattr(args, "fft", None),
            "highest"
            if getattr(args, "matmul_precision", None) == "highest"
            else None,
        )
    if getattr(args, "dist_coordinator", None):
        # multi-host SPMD: one process per host, all running this CLI with
        # the same flags; jax.devices() then spans every host's chips
        jax.distributed.initialize(
            coordinator_address=args.dist_coordinator,
            num_processes=args.dist_num_processes,
            process_id=args.dist_process_id,
        )
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = build_cfg(args)

    n_proc = jax.process_count()
    is_main = jax.process_index() == 0
    if n_proc > 1:
        assert args.data_parallel, "multi-host runs require --data_parallel"
        assert args.seed is not None, (
            "multi-host runs require --seed so every process draws the "
            "same global shuffle"
        )
        assert args.batch_size % n_proc == 0, (
            f"global batch {args.batch_size} must divide over "
            f"{n_proc} processes"
        )
        # the multi-host set_input path shards the GLOBAL batch over every
        # device (parallel/mesh.shard_batch_multihost) with no unsharded
        # fallback — an indivisible batch would die mid-run with a tiling
        # error at the first step, so refuse it loudly at startup
        assert args.batch_size % jax.device_count() == 0, (
            f"global batch {args.batch_size} must divide over "
            f"{jax.device_count()} devices ({n_proc} processes x "
            f"{jax.local_device_count()} local)"
        )

    print(args)
    for path in [args.logdir, args.logdir + "/res", args.logdir + "/ckpt"]:
        os.makedirs(path, exist_ok=True)

    writer = None
    if is_main:
        try:
            from torch.utils.tensorboard import SummaryWriter

            writer = SummaryWriter(args.logdir)
        except Exception as e:  # tensorboard optional
            print("tensorboard unavailable:", e)

    print("loading model...")
    iter_cnt = 0
    ckpt = None
    if args.resume is not None:
        if args.resume == "":  # load latest
            ckpts = sorted(
                glob.glob(args.logdir + "/ckpt/ckpt_*.pt"),
                key=os.path.getmtime,
            )
            if not ckpts:
                raise FileNotFoundError("no available ckpt found")
            ckpt = ckpts[-1]
            iter_cnt = int(ckpt.split(".")[-2].split("_")[-1])
            print("will load latest ckpt from:", ckpt, ", cnt:", iter_cnt)
        else:
            ckpt = args.resume
            print("will load specified ckpt from:", ckpt)
        # thread --seed through the warm-start path too: rebuild-time
        # randomness (mask draws, init of nets NOT in --load_nets) must
        # honor the user's seed, not silently default to 0
        net = CSModel(ckpt=ckpt, cfg=cfg, objects=args.load_nets,
                      seed=getattr(args, "seed", None) or 0)
    else:
        assert args.load_nets is None
        print("training from scratch...")
        net = CSModel(cfg=cfg, seed=getattr(args, "seed", None) or 0)

    if getattr(args, "data_parallel", False):
        from ..parallel.mesh import make_mesh

        mesh = make_mesh()
        net.distribute(mesh)
        print(f"data parallelism over {mesh.size} devices")

    print(net.cfg)
    cfg = net.cfg

    if writer is not None:
        writer.add_text("date", repr(time.ctime()))
        writer.add_text("working dir", repr(os.getcwd()))
        writer.add_text("commands", repr(sys.argv))
        writer.add_text("arguments", repr(args))
        writer.add_text("actual config", repr(cfg))
        writer.add_text("ckpt", repr(ckpt))

    print("loading data...")
    if getattr(args, "native_cache", None):
        # native C++ slice cache (data/native_cache.py + native/slicecache.cpp):
        # the CSVs are compiled once into per-modality mmap caches and the
        # Loader batch-assembles crops via OpenMP (measured 14.6x the python
        # h5 path at 320x320, bench.py --mode input). Prefetch is implied —
        # the mmap IS the in-RAM store after first touch.
        from ..data.native_cache import (
            build_caches_from_csv, NativePairedSlices,
        )

        cache_dir = args.native_cache
        slices_train = NativePairedSlices(
            build_caches_from_csv(
                args.train, args.protocals, os.path.join(cache_dir, "train")
            ),
            crop=int(cfg.shape * 1.1),
        )
        slices_val = NativePairedSlices(
            build_caches_from_csv(
                args.val, args.protocals, os.path.join(cache_dir, "val")
            ),
            crop=cfg.shape,
        )
        n_vol_train = n_vol_val = "?"
    else:
        volumes_train = get_paired_volume_datasets(
            args.train, crop=int(cfg.shape * 1.1), protocals=args.protocals
        )
        volumes_val = get_paired_volume_datasets(
            args.val, crop=cfg.shape, protocals=args.protocals
        )
        slices_train = ConcatDataset(volumes_train)
        slices_val = ConcatDataset(volumes_val)
        n_vol_train, n_vol_val = len(volumes_train), len(volumes_val)
        if args.prefetch:
            slices_train = Prefetch(slices_train)
            slices_val = Prefetch(slices_val)
    seed = getattr(args, "seed", None)
    # per-host sharded input pipeline (SURVEY §5.8): each process loads only
    # the rows destined for its addressable devices; args.batch_size is the
    # GLOBAL batch (reference semantics), split evenly over processes
    local_bs = args.batch_size // n_proc
    shard_kw = dict(num_shards=n_proc, shard_index=jax.process_index())
    loader_train = Loader(
        slices_train, local_bs, shuffle=True,
        num_workers=args.num_workers, drop_last=True,
        seed=seed if seed is not None else int(time.time()), **shard_kw,
    )
    loader_val = Loader(
        slices_val, local_bs, shuffle=False,
        num_workers=args.num_workers, drop_last=True, **shard_kw,
    )

    len_vis, col_vis = 16, 4
    if n_proc == 1:
        vis_rng = np.random.default_rng(19950102 + 666 + 233)
        vis_idx = vis_rng.permutation(len(slices_val))[:len_vis]
        vis_items = [slices_val[int(i)] for i in vis_idx]
        batch_vis = [
            to_device(np.stack([it[m] for it in vis_items], 0))
            for m in range(len(vis_items[0]))
        ]
    else:
        # image dumping is single-process-only (gated below); loading and
        # holding a 16-slice complex device batch on every host would be
        # pure dead weight
        batch_vis = None

    preprocess = _preprocess(args.aux_aug, cfg.shape)
    rng = jax.random.PRNGKey(seed if seed is not None else int(time.time()))

    print(
        f"done, {len(slices_train)} / {n_vol_train} for training, "
        f"{len(slices_val)} / {n_vol_val} for validation"
    )

    print("training...")
    prune_every = int(getattr(args, "prune_every", 0) or 0)
    if prune_every > 0:
        assert getattr(args, "prune_num", 0) > 0, (
            "--prune_every needs --prune_num > 0"
        )
        assert cfg.mask != "loupe", (
            "LOUPE prunes via its probability mask (use --learn_mask), "
            "not the prune schedule"
        )
    last_loss, last_ckpt, last_disp = 0, 0, 0
    signal_end = False
    iter_best = iter_cnt
    loss_best = None
    trace_at = getattr(args, "trace_at", 0)
    time_start = time.time()

    from ..data.loader import device_prefetch

    for num_epoch in range(args.epoch):
        if signal_end:
            break
        ################### training ########################
        for batch_dev0 in device_prefetch(iter(loader_train)):
            if signal_end:
                break
            net.train()
            time_data = time.time() - time_start
            iter_cnt += 1
            rng, k = jax.random.split(rng)
            if jax.process_count() > 1:
                # every process holds the same seed (asserted at startup);
                # without folding in the process index, row j of every
                # host would receive byte-identical augmentation draws
                k = jax.random.fold_in(k, jax.process_index())
            batch_dev = preprocess(batch_dev0, k)
            if trace_at and iter_cnt == trace_at:
                jax.profiler.start_trace(args.logdir + "/trace")
            net.set_input(*batch_dev)
            net.update()
            if prune_every > 0:
                # pruning schedule (extension; the reference exposes
                # CSModel.prune, model.py:288-290, but never schedules it)
                if cfg.mask == "taylor":
                    # per-batch Taylor saliency accumulation
                    # (masks.py:232-244 backward-hook equivalent)
                    net.taylor_step()
                if iter_cnt % prune_every == 0:
                    net.prune(args.prune_num)
                    dens = float(
                        1.0 - np.asarray(net.state["pruned"]).mean()
                    )
                    print(f"\npruned at iter {iter_cnt}: "
                          f"keep density {dens:.4f}", flush=True)
            if trace_at and iter_cnt == trace_at:
                jax.block_until_ready(net.state["params"])
                jax.profiler.stop_trace()
                print(f"\nprofiler trace written to {args.logdir}/trace")
            time_start = time.time()

            if iter_cnt % 50 == 0 and writer is not None:
                last_loss = iter_cnt
                vis = net.get_vis("scalars")
                for name, val in vis["scalars"].items():
                    writer.add_scalar("train/" + name, val, iter_cnt)
                vis = net.get_vis("histograms")
                for name, val in vis["histograms"].items():
                    writer.add_histogram(
                        tag="train/" + name, global_step=iter_cnt, **val
                    )
            if (n_proc == 1) and ((iter_cnt % 1000 == 0) or (
                (iter_cnt < 10000) and (iter_cnt % 100 == 0)
            )):
                # image grids need host-addressable arrays; on multi-host
                # the vis batch would be sharded across processes — skip
                last_disp = iter_cnt
                net.eval()
                net.set_input(*batch_vis)
                net.test()
                vis = net.get_vis("images")
                for name, val in vis["images"].items():
                    save_image(
                        val,
                        args.logdir + "/res/" + "%010d_" % iter_cnt + name + ".jpg",
                        nrow=len_vis // col_vis, padding=10,
                        value_range=(0, 1), pad_value=0.5,
                    )
            if (iter_cnt % 5000 == 0) or (
                (iter_cnt < 10000) and (iter_cnt % 1000 == 0)
            ):
                last_ckpt = iter_cnt
                if is_main:  # params are replicated: host 0's copy is global
                    net.save(args.logdir + "/ckpt/ckpt_%010d.pt" % iter_cnt,
                             with_opt=getattr(args, "save_opt", False))
            if iter_cnt % 50 == 0:
                postfix = f"[{iter_cnt}/{last_loss}/{last_disp}/{last_ckpt}]"
                # surface stalls in the input pipeline (train.py:258-261)
                if time_data >= 0.1:
                    postfix += f" data {time_data:.1f}"
                print("\r" + postfix, end="", flush=True)

        ################### validation ########################
        net.eval()
        stat_eval, stat_loss = [], []
        for batch in loader_val:
            batch_dev = [to_device(x) for x in batch]
            batch_dev = [center_crop(x, (cfg.shape, cfg.shape)) for x in batch_dev]
            net.set_input(*batch_dev)
            stat_loss.append(net.test())
            vis = net.get_vis("scalars")
            stat_eval.append(vis["scalars"])
        if not stat_eval:
            continue
        vis = {
            key: statistics.mean([x[key] for x in stat_eval])
            for key in stat_eval[0]
        }
        if writer is not None:
            for name, val in vis.items():
                writer.add_scalar("val/" + name, val, iter_cnt)
        loss_current = statistics.mean(stat_loss)
        print(f"\nepoch {num_epoch}: val {vis}")
        if args.intel_stop > 0:
            if (loss_best is None) or (loss_current < loss_best):
                loss_best = loss_current
                iter_best = iter_cnt
                if is_main:
                    # ckpt_save replaces atomically (temp dir + swap);
                    # pre-deleting here would destroy the only best.pt if
                    # the save fails mid-write
                    best = args.logdir + "/ckpt/best.pt"
                    net.save(best, with_opt=getattr(args, "save_opt", False))
            elif iter_cnt >= args.intel_stop + iter_best:
                signal_end = True
                print("signal_end set due to intel_stop")

    print("reached end of training loop, and signal_end is " + str(signal_end))
    if writer is not None:
        writer.flush()
        writer.close()
    final = args.logdir + "/ckpt/ckpt_%010d.pt" % iter_cnt
    if is_main and not os.path.exists(final):
        net.save(final, with_opt=getattr(args, "save_opt", False))
        print("saved final ckpt:", final)


def try_int(v):
    try:
        v = int(v)
    except ValueError:
        v = int(float(v))
    assert v >= 0
    return v


def build_parser():
    parser = argparse.ArgumentParser(description="CS with adaptive mask (TPU)")
    parser.add_argument("--logdir", metavar="logdir", type=str, required=True,
                        help="path for storage and checkpoint")
    parser.add_argument("--resume", type=str, default=None,
                        help="ckpt path; empty str loads the latest ckpt")
    parser.add_argument("--load_nets", type=str, nargs="*", default=None,
                        help="networks to load from the checkpoint")
    parser.add_argument("--epoch", type=int, default=150)
    parser.add_argument("--batch_size", type=int, default=10)
    parser.add_argument("--num_workers", type=int, default=os.cpu_count())
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--intel_stop", type=try_int, default=0, metavar="N",
                        help="stop after val loss stalls for N iters")
    parser.add_argument("--reg", type=str, required=True,
                        choices=["None", "Rec", "Mixed", "GAN-Only"])
    parser.add_argument("--smooth_weight", type=float, required=True)
    parser.add_argument("--gan_weight", type=float, required=True)
    parser.add_argument("--gan_sim_weight", type=float, required=True)
    parser.add_argument("--sim_weight", type=float, required=True)
    parser.add_argument("--mask", metavar="type", required=True, type=str)
    parser.add_argument("--sparsity", metavar="0-1", type=float, default=None)
    parser.add_argument("--learn_mask", action="store_true",
                        help="LOUPE live mask learning: gradients reach the "
                             "mask logits through the soft sample")
    parser.add_argument("--prune_every", type=int, default=0, metavar="N",
                        help="prune the mask every N iters (taylor/magnitude "
                             "masks); 0 disables")
    parser.add_argument("--prune_num", type=int, default=0, metavar="K",
                        help="lines to prune per prune_every round")
    parser.add_argument("--train", metavar="/path/to/training_data",
                        required=True, type=str)
    parser.add_argument("--val", metavar="/path/to/validation_data",
                        required=True, type=str)
    parser.add_argument("--crop", type=int, default=320)
    parser.add_argument("--coils", type=int, default=1)
    parser.add_argument("--protocals", metavar="NAME", type=str, default=None,
                        nargs="*")
    parser.add_argument("--aux_aug", type=str, required=True,
                        choices=AUG_POLICIES)
    parser.add_argument("--prefetch", action="store_true")
    parser.add_argument("--native_cache", type=str, default=None,
                        metavar="DIR",
                        help="compile the CSVs into native mmap slice "
                             "caches under DIR and batch-assemble via the "
                             "C++ OpenMP library (14.6x the python loader)")
    parser.add_argument("--use_amp", action="store_true")
    parser.add_argument("--grad_accum", type=int, default=1, metavar="K",
                        help="accumulate gradients over K micro-batches "
                             "(one optimizer step per global batch)")
    parser.add_argument("--force_gpu", action="store_true",
                        help="accepted for reference-CLI compatibility (no-op)")
    parser.add_argument("--net_scale", type=str, default="full",
                        choices=["full", "tiny"],
                        help="tiny = reduced nets for smoke tests")
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard the batch across all local devices")
    parser.add_argument("--platform", type=str, default=None,
                        help="force a jax platform (e.g. cpu, tpu)")
    parser.add_argument("--seed", type=int, default=None,
                        help="seed loader shuffling and augmentation RNG")
    parser.add_argument("--matmul_precision", type=str, default=None,
                        choices=["default", "high", "highest"],
                        help="jax matmul/conv precision (TPU parity knob)")
    parser.add_argument("--fft", type=str, default=None,
                        choices=["auto", "xla", "matmul"],
                        help="FFT implementation: auto picks matmul-DFT on "
                             "TPU (2.4x the native FFT at 320), xla forces "
                             "the native FFT (strict-parity runs)")
    parser.add_argument("--trace_at", type=int, default=0, metavar="N",
                        help="capture a jax.profiler trace at iteration N")
    parser.add_argument("--save_opt", action="store_true",
                        help="include optimizer state in checkpoints")
    parser.add_argument("--dist_coordinator", type=str, default=None,
                        metavar="HOST:PORT",
                        help="jax.distributed coordinator for multi-host "
                             "SPMD (one process per host)")
    parser.add_argument("--dist_num_processes", type=int, default=None)
    parser.add_argument("--dist_process_id", type=int, default=None)
    return parser


if __name__ == "__main__":
    main(build_parser().parse_args())
