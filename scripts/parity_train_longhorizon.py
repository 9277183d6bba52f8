#!/usr/bin/env python3
"""Long-horizon training parity vs the reference (torch CPU).

tests/test_train_step_parity.py pins 3-step update parity; this script
extends the same transplant methodology to hundreds of update steps and a
final eval, bounding optimizer/spectral-norm/precision drift at training-
recipe horizon (reference train.py:191-309 + model.py:193-259).

Method
------
1. Build the reference CSModel at the tiny-but-complete scale (runtime
   constructor patching only — the reference tree is never modified),
   checkpoint it, convert with torch_compat into our CSModel.
2. Build a SECOND reference model from the same initial weights with a
   ~1e-6-relative parameter perturbation. Training dynamics at this scale
   are chaotic (spectral-norm power iteration, sign-of-tiny-gradient Adam
   steps), so the honest tolerance is empirical: the perturbed twin's
   trajectory divergence is the NOISE FLOOR a numerically-faithful
   implementation may show. Cross-framework deltas at step 0 are ~1e-6
   relative (fp32 reduction-order), which the perturbation emulates.
3. Run all three models through the identical batch schedule for --steps
   update() steps, recording every loss scalar per step; finish with an
   eval-mode forward on a held-out batch scored by our numpy metrics
   (skimage-formula, parity-tested) for all three.
4. Write docs/parity_train/<reg>.json + a pass/fail summary comparing our
   divergence-from-reference against the noise-floor envelope.

Pass criterion (per loss key): windowed-median relative divergence of ours
vs reference <= max(ENVELOPE_K x the perturbed twin's, ABS_FLOOR). Final
eval PSNR delta <= max(ENVELOPE_K x twin's delta, 0.15 dB).

Usage: python scripts/parity_train_longhorizon.py --reg Rec --steps 300
"""

import argparse
import copy
import json
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)
# APPEND: the reference dir holds generically-named modules (model, masks,
# train, ...); first-on-path would shadow real packages (see
# tests/test_train_step_parity.py).
if REF not in sys.path:
    sys.path.append(REF)

ENVELOPE_K = 5.0     # ours may diverge up to 5x the perturbed-twin floor
ABS_FLOOR = 0.02     # ...or 2% relative, whichever is larger (step-0
                     # cross-framework fp32 deltas are ~1e-3 on loss scale)
PSNR_ABS_FLOOR = 0.15  # dB; final-eval PSNR absolute floor

_SCALE = dict(
    net_G_layers=[4, 8],
    net_D_blocks=[[4], [8]],
    net_T_layers=[32, 64, 64, 64, 64],
    net_R_cascades=2,
    net_R_chans=4,
    net_R_sens_chans=4,
    net_R_pools=2,
    net_R_sens_pools=2,
)


def _stub_skimage():
    # reference model.py imports its metrics.py (skimage, absent here);
    # update() never calls those metrics and we score eval ourselves.
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        sk.metrics = types.ModuleType("skimage.metrics")
        sk.metrics.structural_similarity = None
        sk.metrics.peak_signal_noise_ratio = None
        sys.modules["skimage"] = sk
        sys.modules["skimage.metrics"] = sk.metrics


def _build_reference(reg, shape):
    import torch
    import model as ref_model
    import gan as ref_gan
    import varnet as ref_varnet
    from basemodel import Config as RefConfig

    # runtime constructor patching to the tiny scale (reference files
    # untouched); identical to tests/test_train_step_parity.py
    ref_model.NetG = lambda **kw: ref_gan.NetG(
        in_channels=1, out_channels=1, layers=(4, 8))
    ref_model.NetD = lambda **kw: ref_gan.NetD(
        in_channels=2, layers=([4], [8]))
    ref_model.VarNet = lambda **kw: ref_varnet.VarNet(
        num_cascades=2, sens_chans=4, sens_pools=2, chans=4, pools=2,
        use_ref=True)

    cfg = RefConfig()
    cfg.sparsity = 0.5  # 5 ACS lines at width 32 (0.25 leaves 2: chaotic)
    cfg.lr = 1e-4
    cfg.shape = shape
    cfg.coils = 1
    cfg.reg = reg
    cfg.mask = "equispaced"
    cfg.weight_smooth = 1000.0
    cfg.weight_gan = 0.1
    cfg.weight_gan_sim = 1.0
    cfg.weight_sim = 1.0
    cfg.use_amp = False
    for k, v in _SCALE.items():
        setattr(cfg, k, v)
    torch.manual_seed(11)
    return ref_model.CSModel(cfg=cfg)


def _perturb(net, rel=1e-6, seed=99):
    """Relative gaussian parameter perturbation — the noise-floor twin."""
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for module in (net.net_G, net.net_D, net.net_T, net.net_R):
            for p in module.parameters():
                noise = torch.randn(p.shape, generator=g)
                p.add_(noise * rel * (p.abs() + p.abs().mean() + 1e-12))


def _ref_losses(net):
    import torch

    return {
        k: float(v.detach()) if isinstance(v, torch.Tensor) else float(v)
        for k, v in vars(net).items()
        if k.startswith("loss_") and k != "loss_all" and v is not None
    }


def _batches(n_batches, batch, shape, seed=3):
    rng = np.random.default_rng(seed)
    mk = lambda: (
        rng.standard_normal((batch, 1, shape, shape))
        + 1j * rng.standard_normal((batch, 1, shape, shape))
    ).astype(np.complex64) * 0.3
    return [(mk(), mk()) for _ in range(n_batches)]


def _ref_eval(net, full, aux):
    """Eval-mode forward; PSNR/SSIM via OUR parity-tested numpy metrics
    (the reference's metrics.py needs skimage, stubbed out above)."""
    import torch
    from spatialalignmentnetwork_tpu.utils import metrics as M

    net.eval()
    with torch.no_grad():
        net.set_input(torch.from_numpy(full), torch.from_numpy(aux))
        net.loss_all = 0
        net.forwardT()
        net.loss_all = 0
        if net.cfg.reg in ("Mixed", "GAN-Only"):
            net.forwardG()
        net.loss_all = 0
        net.forwardR()
        gt = net.img_full_rss.cpu().numpy()
        rec = net.img_rec.cpu().numpy()
    net.train()
    return {"PSNR": M.psnr(gt, rec), "SSIM": M.ssim(gt, rec)}


def _run_reference(net, batches, steps, tag):
    import torch

    losses = []
    t0 = time.time()
    net.train()
    for i in range(steps):
        full, aux = batches[i % len(batches)]
        net.set_input(torch.from_numpy(full), torch.from_numpy(aux))
        net.update()
        losses.append(_ref_losses(net))
        if (i + 1) % 50 == 0:
            print(f"  [{tag}] step {i+1}/{steps} "
                  f"({(time.time()-t0)/(i+1):.2f}s/step)", flush=True)
    return losses


def _run_ours(ckpt, batches, steps, tag):
    from spatialalignmentnetwork_tpu.engine.csmodel import CSModel

    net = CSModel(ckpt=ckpt)
    net.train()
    losses = []
    t0 = time.time()
    for i in range(steps):
        full, aux = batches[i % len(batches)]
        net.set_input(full, aux)
        net.update()
        losses.append({
            k: v for k, v in net.get_vis("scalars")["scalars"].items()
            if k.startswith("loss_")
        })
        if (i + 1) % 50 == 0:
            print(f"  [{tag}] step {i+1}/{steps} "
                  f"({(time.time()-t0)/(i+1):.2f}s/step)", flush=True)
    return net, losses


def _divergence(a, b, key):
    """Per-step relative divergence of loss `key` between trajectories."""
    out = []
    for wa, wb in zip(a, b):
        if key not in wa or key not in wb:
            continue
        va, vb = wa[key], wb[key]
        fa, fb = np.isfinite(va), np.isfinite(vb)
        if fa != fb:
            # one side went non-finite while the other stayed finite:
            # that IS divergence, not a skippable step — record inf so
            # the max-divergence check fails the key loudly
            out.append(np.inf)
            continue
        if not fa:
            # matching non-finites (untrained SN generator) are parity
            continue
        out.append(abs(va - vb) / (abs(vb) + 1e-12))
    return np.asarray(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reg", choices=["Rec", "Mixed"], default="Rec")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--shape", type=int, default=32)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--n_batches", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "parity_train"))
    args = ap.parse_args()

    if not os.path.isdir(REF):
        sys.exit("reference not mounted at /root/reference")

    # ours runs JAX CPU (sitecustomize forces the axon tunnel otherwise)
    import jax

    jax.config.update("jax_platforms", "cpu")
    _stub_skimage()
    import torch

    torch.set_num_threads(max(1, (os.cpu_count() or 2) // 2))

    from spatialalignmentnetwork_tpu.engine.torch_compat import (
        convert_reference_checkpoint,
    )

    os.makedirs(args.out, exist_ok=True)
    import shutil
    work = os.path.join("/tmp", f"parity_lh_{args.reg}")
    shutil.rmtree(work, ignore_errors=True)  # ckpt_save refuses to overwrite
    os.makedirs(work)

    print(f"building reference ({args.reg}) ...", flush=True)
    ref = _build_reference(args.reg, args.shape)
    ref_dir = os.path.join(work, "init_ref.pt")
    ref.save(ref_dir)
    conv = os.path.join(work, "init_conv.pt")
    convert_reference_checkpoint(ref_dir, conv)

    twin = _build_reference(args.reg, args.shape)
    # same initial weights, then the noise-floor perturbation
    for name in ("net_G", "net_D", "net_T", "net_R", "net_mask"):
        getattr(twin, name).load_state_dict(
            copy.deepcopy(getattr(ref, name).state_dict()))
    _perturb(twin)

    batches = _batches(args.n_batches, args.batch, args.shape)
    heldout = _batches(1, args.batch, args.shape, seed=77)[0]

    print(f"running reference {args.steps} steps ...", flush=True)
    ref_losses = _run_reference(ref, batches, args.steps, "ref")
    print("running perturbed twin ...", flush=True)
    twin_losses = _run_reference(twin, batches, args.steps, "twin")
    print("running ours ...", flush=True)
    ours_net, our_losses = _run_ours(conv, batches, args.steps, "ours")

    # final held-out eval, all three
    ref_eval = _ref_eval(ref, *heldout)
    twin_eval = _ref_eval(twin, *heldout)
    ours_net.eval()
    ours_net.set_input(*heldout)
    ours_net.test()
    sc = ours_net.get_vis("scalars")["scalars"]
    our_eval = {"PSNR": sc["metric_PSNR"], "SSIM": sc["metric_SSIM"]}

    # ---- verdicts ----
    keys = sorted({k for step in ref_losses for k in step})
    summary, ok = {}, True
    for k in keys:
        d_ours = _divergence(our_losses, ref_losses, k)
        d_twin = _divergence(twin_losses, ref_losses, k)
        if len(d_ours) == 0:
            summary[k] = {"missing": True}
            ok = False
            continue
        # medians over the trailing half: early steps are near-identical
        # everywhere, the horizon's accumulated drift is the test
        half = len(d_ours) // 2
        m_ours = float(np.median(d_ours[half:]))
        m_twin = float(np.median(d_twin[half:])) if len(d_twin) else 0.0
        bound = max(ENVELOPE_K * m_twin, ABS_FLOOR)
        summary[k] = {
            "median_rel_divergence_ours": m_ours,
            "median_rel_divergence_noise_floor": m_twin,
            "bound": bound,
            "pass": m_ours <= bound,
        }
        ok = ok and m_ours <= bound

    d_psnr_ours = abs(our_eval["PSNR"] - ref_eval["PSNR"])
    d_psnr_twin = abs(twin_eval["PSNR"] - ref_eval["PSNR"])
    psnr_bound = max(ENVELOPE_K * d_psnr_twin, PSNR_ABS_FLOOR)
    summary["final_eval_PSNR"] = {
        "ref": ref_eval["PSNR"], "twin": twin_eval["PSNR"],
        "ours": our_eval["PSNR"], "delta_ours": d_psnr_ours,
        "delta_noise_floor": d_psnr_twin, "bound": psnr_bound,
        "pass": d_psnr_ours <= psnr_bound,
    }
    ok = ok and d_psnr_ours <= psnr_bound

    artifact = {
        "reg": args.reg,
        "steps": args.steps,
        "shape": args.shape,
        "batch": args.batch,
        "scale": _SCALE,
        "envelope_k": ENVELOPE_K,
        "abs_floor": ABS_FLOOR,
        "losses_reference": ref_losses,
        "losses_noise_floor_twin": twin_losses,
        "losses_ours": our_losses,
        "final_eval": {"reference": ref_eval, "twin": twin_eval,
                       "ours": our_eval},
        "summary": summary,
        "pass": ok,
    }
    path = os.path.join(args.out, f"{args.reg.lower()}_{args.steps}steps.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"summary": summary, "pass": ok}, indent=1))
    print("wrote", path)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
