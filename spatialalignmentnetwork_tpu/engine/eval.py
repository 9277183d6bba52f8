"""Evaluation CLI mirroring the reference eval.py.

Loads a checkpoint (config restored from inside it), iterates volumes with
the WHOLE volume as one batch (eval.py:54-56), optionally applies a scaled
synthetic misalignment to the aux modality (`--aux_aug factor`,
eval.py:15-27,44-61), computes PSNR/SSIM/MAE/MSE/MI per volume, dumps a
metrics JSON, and optionally saves image/aux/sampled/warped/rec volumes plus
the displacement grid (NIfTI when nibabel is available, .npy otherwise).
"""

import os
import json
import time
import statistics
import argparse

import numpy as np
import jax
import jax.numpy as jnp

from ..data.paired_dataset import get_paired_volume_datasets
from ..data.augment import scaled_deformation
from ..ops.crop import center_crop
from ..utils.transfer import to_device
from .csmodel import CSModel


def _bucket_pad(arrays, bucket):
    """Pad [S, ...] numpy arrays to the next multiple of `bucket` along the
    slice axis, preserving the forwardG half-split semantics: the first
    ceil(S/2) slices stay at the front and the remaining slices start at
    ceil(P/2) (csmodel._forward_TGR splits at n1 = ceil(n/2), mirroring
    reference model.py:125-136 torch.chunk). Volumes with different slice
    counts padded to the same bucket share ONE compiled test step.

    Returns (padded_arrays, valid[P] float32, restore_indices[S]).
    """
    s = arrays[0].shape[0]
    p = -(-s // bucket) * bucket
    if p == s:
        return arrays, np.ones(s, np.float32), np.arange(s)
    n1s, n1p = (s + 1) // 2, (p + 1) // 2
    idx = np.concatenate([np.arange(n1s), n1p + np.arange(s - n1s)])
    valid = np.zeros(p, np.float32)
    valid[idx] = 1.0
    out = []
    for a in arrays:
        padded = np.zeros((p,) + a.shape[1:], a.dtype)
        padded[:n1s] = a[:n1s]
        padded[n1p:n1p + (s - n1s)] = a[n1s:]
        out.append(padded)
    return out, valid, idx


def _save_volume(arr, path, affine):
    """Save [S, H, W] (or [2, S, H, W] grid) as NIfTI if nibabel exists,
    else .npy."""
    try:
        import nibabel as nib

        nib.save(nib.Nifti1Image(np.asarray(arr).T, affine), path)
    except ImportError:
        np.save(path + ".npy", np.asarray(arr))


def main(args):
    if getattr(args, "platform", None):
        jax.config.update("jax_platforms", args.platform)
    if getattr(args, "matmul_precision", None):
        jax.config.update(
            "jax_default_matmul_precision", args.matmul_precision
        )
    if getattr(args, "fft", None) or (
        getattr(args, "matmul_precision", None) == "highest"
    ):
        from ..ops.fft import set_fft_impl

        # strict-parity runs pin the matmul-DFT to f32-exact accumulation
        set_fft_impl(
            getattr(args, "fft", None),
            "highest"
            if getattr(args, "matmul_precision", None) == "highest"
            else None,
        )
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    affine = np.eye(4) * [0.7, -0.7, -5, 1]
    print(args)
    if args.save is not None:
        os.makedirs(args.save, exist_ok=True)
    if getattr(args, "metric", None):
        metric_dir = os.path.dirname(os.path.abspath(args.metric))
        os.makedirs(metric_dir, exist_ok=True)

    if os.path.isdir(args.resume) or os.path.isfile(args.resume):
        net = CSModel(ckpt=args.resume)
        print("load ckpt from:", args.resume)
    else:
        raise FileNotFoundError(args.resume)
    cfg = net.cfg

    crop = int(cfg.shape * 1.1) if args.aux_aug > 0 else cfg.shape
    volumes = get_paired_volume_datasets(
        args.val, crop=crop, protocals=args.protocals
    )
    net.eval()
    if getattr(args, "data_parallel", False):
        # whole volumes are evaluated as one batch (the slice axis); shard
        # slices across the mesh — the "batched 3-D volumes sharded across
        # a slice" serving configuration
        from ..parallel.mesh import make_mesh

        mesh = make_mesh()
        net.distribute(mesh)
        print(f"data parallelism over {mesh.size} devices")

    rng = jax.random.PRNGKey(int(time.time()))
    bucket = int(getattr(args, "bucket", 16) or 0)
    stat_eval = []

    def stage(volume):
        """Host stack + bucket pad + async H2D for one volume."""
        host_batch = [
            np.stack(s, axis=0)
            for s in zip(*[volume[j] for j in range(len(volume))])
        ]
        if bucket > 0:
            # pad the slice axis to a bucket size so a whole split with
            # varying slice counts compiles only a handful of test steps;
            # pad slices are masked out of every scalar by net.test(valid)
            host_batch, valid, restore = _bucket_pad(host_batch, bucket)
        else:
            valid, restore = None, np.arange(host_batch[0].shape[0])
        return [to_device(x) for x in host_batch], valid, restore

    def collect(i, aux, restore):
        """Host readbacks for a volume whose step was already dispatched."""
        scalars = {
            k: float(v) for k, v in aux.items()
            if k.startswith("loss_") or k.startswith("metric_")
        }
        stat_eval.append(scalars)
        print(f"volume {i}: "
              + str({k: round(v, 4) for k, v in scalars.items()}))
        if args.save is None:
            return
        grid = np.asarray(aux["img_offset"])[restore]  # [S, H, W, 2]
        grid = np.stack(
            [grid[..., 0], grid[..., 1], np.zeros_like(grid[..., 0])], axis=-1
        ) * (cfg.shape - 1) / 2
        grid = np.transpose(grid, (3, 0, 1, 2))[:, None]
        _save_volume(grid, f"{args.save}/{i}_grid.nii", affine)
        for name, key in (
            ("image", "img_full_rss"),
            ("aux", "img_aux_rss"),
            ("sampled", "img_sampled_rss"),
            ("warped", "img_warped_rss"),
            ("rec", "img_rec"),
        ):
            vol = np.asarray(aux[key])[restore][:, 0]  # [S, H, W]
            _save_volume(vol, f"{args.save}/{i}_{name}.nii", affine)

    # double-buffered volume loop: volume i+1 is staged (host prep + async
    # device transfer) and dispatched before volume i's scalars are read
    # back, so H2D and the host readbacks overlap device compute
    pending = None
    staged = stage(volumes[0]) if volumes else None
    for i, volume in enumerate(volumes):
        batch, valid, restore = staged
        staged = stage(volumes[i + 1]) if i + 1 < len(volumes) else None
        if args.aux_aug > 0:
            img_full, img_aux = batch
            rng, k = jax.random.split(rng)
            img_aux = scaled_deformation(k, img_aux, args.aux_aug)
            batch = [
                center_crop(x, (cfg.shape, cfg.shape))
                for x in (img_full, img_aux)
            ]
        net.set_input(*batch)
        net.test(valid=valid, sync=False)
        aux = net._aux
        # retain only what collect() reads: the scalar losses/metrics, plus
        # the image volumes when saving. Holding the whole aux dict kept a
        # previous volume's 7+ full-volume device arrays alive through the
        # next volume's step — avoidable peak-memory on a 16 GB chip.
        keep = {
            k: v for k, v in aux.items()
            if k.startswith("loss_") or k.startswith("metric_")
        }
        if args.save is not None:
            for key in ("img_offset", "img_full_rss", "img_aux_rss",
                        "img_sampled_rss", "img_warped_rss", "img_rec"):
                keep[key] = aux[key]
        if pending is not None:
            collect(*pending)
        pending = (i, keep, restore)
    if pending is not None:
        collect(*pending)

    # raise BEFORE writing the metrics file: a misconfigured --val must not
    # leave behind a present-but-empty artifact for drivers that only read
    # the file, not the exit code
    if not stat_eval:
        raise ValueError(f"no volumes found in {args.val}")
    if args.metric is not None:
        from ..ops.fft import active_fft_impl, _FFT_MATMUL_PRECISION

        # self-describing parity artifact: record the numerics that
        # produced these metrics (the matmul-DFT default carries ~2.3e-5
        # rel err per transform vs the native FFT)
        meta = {
            "fft_impl": active_fft_impl(cfg.shape, cfg.shape),
            "fft_matmul_precision": _FFT_MATMUL_PRECISION,
            "matmul_precision": getattr(args, "matmul_precision", None),
            "backend": jax.default_backend(),
            "checkpoint": os.path.abspath(args.resume),
        }
        with open(args.metric, "w") as f:
            json.dump({"meta": meta, "volumes": stat_eval}, f)
    vis = {
        key: statistics.mean([x[key] for x in stat_eval])
        for key in stat_eval[0]
    }
    print(vis)
    return vis


def build_parser():
    parser = argparse.ArgumentParser(description="CS evaluation (TPU)")
    parser.add_argument("--resume", type=str, required=True,
                        help="checkpoint path")
    parser.add_argument("--save", default=None, metavar="/path/to/save",
                        type=str, help="path to save evaluated data")
    parser.add_argument("--metric", default=None, metavar="/path/to/metric",
                        type=str, help="path to save metrics JSON")
    parser.add_argument("--val", metavar="/path/to/evaluation_data",
                        required=True, type=str)
    # accepted-but-unused, mirroring the reference exactly: its eval.py
    # defines --crop (eval.py:110) but derives the crop from the
    # checkpoint's cfg.shape (eval.py:44-49), as main() above does
    parser.add_argument("--crop", type=int, default=320)
    parser.add_argument("--protocals", metavar="NAME", type=str, default=None,
                        nargs="*")
    parser.add_argument("--aux_aug", type=float, default=-1,
                        help="scaled misalignment factor; -1 disables")
    parser.add_argument("--bucket", type=int, default=16,
                        help="pad each volume's slice axis to a multiple of "
                             "this so varying slice counts share compiled "
                             "steps (pad slices are masked out of metrics); "
                             "0 disables")
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard volume slices across all local devices")
    parser.add_argument("--platform", type=str, default=None,
                        help="force a jax platform (e.g. cpu, tpu)")
    parser.add_argument("--matmul_precision", type=str, default=None,
                        choices=["default", "high", "highest"],
                        help="jax matmul/conv precision (TPU parity knob)")
    parser.add_argument("--fft", type=str, default=None,
                        choices=["auto", "xla", "matmul"],
                        help="FFT implementation: auto picks matmul-DFT on "
                             "TPU, xla forces the native FFT")
    args = parser.parse_args()
    return args


if __name__ == "__main__":
    main(build_parser())
