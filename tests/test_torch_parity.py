"""Numerical parity vs the reference PyTorch implementation.

These tests import the reference modules (read-only, used purely as a test
oracle — no code is copied), convert their randomly-initialized weights
with engine.torch_compat, and assert both frameworks produce the same
outputs on the same inputs. This validates both the architecture
re-implementation and the checkpoint cross-loading path.
"""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not __import__("os").path.isdir(REF), reason="reference repo not mounted"
)
# APPEND (not insert(0)): the reference dir holds generically-named
# modules (model, masks, train, eval, ...); putting it FIRST on sys.path
# would shadow real modules for the whole pytest process. Appended, real
# modules win and only names nothing else provides resolve to the oracle.
if REF not in sys.path:
    sys.path.append(REF)

import torch  # noqa: E402

from spatialalignmentnetwork_tpu.engine import torch_compat as TC  # noqa: E402
from spatialalignmentnetwork_tpu.engine.checkpoint import flatten_tree  # noqa: E402
from spatialalignmentnetwork_tpu.engine.csmodel import CSModel  # noqa: E402


def _merge(template, flat):
    return CSModel._merge_like(template, flat)


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_fastmri_unet_parity():
    import varnet as ref_varnet  # reference module (oracle)

    torch.manual_seed(0)
    tnet = ref_varnet.Unet(in_chans=3, out_chans=2, chans=4, num_pool_layers=2)
    tnet.eval()
    x = _rand((2, 3, 24, 24), 1)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()

    from spatialalignmentnetwork_tpu.models.unet import Unet

    jnet = Unet(out_chans=2, chans=4, num_pool_layers=2)
    xn = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    tmpl = jnet.init(jax.random.PRNGKey(0), xn)
    flat = TC.fastmri_unet_to_flax(_sd(tnet), "", num_pools=2)
    params = _merge(tmpl["params"], flat)
    got = np.transpose(np.asarray(jnet.apply({"params": params}, xn)), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_varnet_parity():
    import varnet as ref_varnet

    torch.manual_seed(1)
    kwargs = dict(num_cascades=2, sens_chans=4, sens_pools=2, chans=4, pools=2)
    tnet = ref_varnet.VarNet(use_ref=True, **kwargs)
    tnet.eval()

    size, coils, n = 32, 1, 2
    rng = np.random.default_rng(2)
    k = (rng.standard_normal((n, coils, size, size))
         + 1j * rng.standard_normal((n, coils, size, size))).astype(np.complex64)
    pruned = rng.random(size) > 0.5
    pruned[:4] = False
    pruned[-4:] = False
    mask = ~pruned
    k = k * mask[None, None, None, :]
    ref_img = np.abs(rng.standard_normal((n, coils, size, size))).astype(np.float32)
    num_low = 8

    with torch.no_grad():
        want = tnet(
            torch.from_numpy(k), torch.from_numpy(mask[None, None, None, :]),
            torch.from_numpy(ref_img), num_low,
        ).numpy()

    from spatialalignmentnetwork_tpu.models.varnet import VarNet

    jnet = VarNet(use_ref=True, num_cascades=2, sens_chans=4, sens_pools=2,
                  chans=4, pools=2)
    tmpl = jnet.init(
        jax.random.PRNGKey(0), jnp.asarray(k), jnp.asarray(mask),
        jnp.asarray(ref_img), num_low,
    )
    flat = TC.varnet_to_flax(_sd(tnet), num_cascades=2, sens_pools=2, pools=2)
    params = _merge(tmpl["params"], flat)
    got = np.asarray(
        jnet.apply({"params": params}, jnp.asarray(k), jnp.asarray(mask),
                   jnp.asarray(ref_img), num_low)
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_libunet_parity():
    import unet as ref_unet

    torch.manual_seed(2)
    tnet = ref_unet.UNet(3, 2, (4, 8, 8))
    # push some batches through to move BN running stats off their init
    tnet.train()
    with torch.no_grad():
        for s in range(3):
            tnet(torch.from_numpy(_rand((4, 3, 16, 16), 10 + s)))
    tnet.eval()
    x = _rand((2, 3, 16, 16), 3)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()

    from spatialalignmentnetwork_tpu.models.unet_lib import LibUNet

    jnet = LibUNet(out_chans=2, layers=(4, 8, 8))
    xn = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    tmpl = jnet.init({"params": jax.random.PRNGKey(0)}, xn, train=False)
    keys = [f"LibUNet_0/{k}" for k in flatten_tree(tmpl["params"]).keys()]
    pflat, sflat = TC.libunet_family_to_flax(
        _sd(tnet),
        *TC._libunet_slots(keys),
    )
    strip = lambda d: {k[len("LibUNet_0/"):]: v for k, v in d.items()}
    params = _merge(tmpl["params"], strip(pflat))
    stats = _merge(tmpl["batch_stats"], strip(sflat))
    got = np.transpose(
        np.asarray(
            jnet.apply({"params": params, "batch_stats": stats}, xn, train=False)
        ),
        (0, 3, 1, 2),
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_stn_parity():
    import cross as ref_cross

    torch.manual_seed(3)
    tnet = ref_cross.SpatialTransformer(channels=1)
    tnet.eval()
    mov = np.abs(_rand((2, 1, 32, 32), 4))
    fix = np.abs(_rand((2, 1, 32, 32), 5))
    with torch.no_grad():
        t_off, t_grid = tnet(torch.from_numpy(mov), torch.from_numpy(fix))
        t_warp = tnet.warp(torch.from_numpy(mov), t_grid)

    from spatialalignmentnetwork_tpu.models.stn import SpatialTransformer, warp

    jnet = SpatialTransformer(channels=1)
    vs = jnet.init({"params": jax.random.PRNGKey(0)},
                   jnp.asarray(mov), jnp.asarray(fix), train=False)
    pflat, sflat = TC.stn_to_flax(_sd(tnet), flatten_tree(vs["params"]).keys())
    params = _merge(vs["params"], pflat)
    stats = _merge(vs["batch_stats"], sflat)
    j_off, j_grid = jnet.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(mov), jnp.asarray(fix), train=False,
    )
    np.testing.assert_allclose(
        np.asarray(j_off), t_off.numpy(), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(j_grid), t_grid.numpy(), rtol=1e-3, atol=1e-5
    )
    j_warp = warp(jnp.asarray(mov), j_grid)
    np.testing.assert_allclose(
        np.asarray(j_warp), t_warp.numpy(), rtol=1e-3, atol=1e-4
    )


def test_netg_parity():
    import gan as ref_gan

    torch.manual_seed(4)
    tnet = ref_gan.NetG(in_channels=1, out_channels=1, layers=(4, 8))
    tnet.eval()
    x = np.abs(_rand((2, 1, 16, 16), 6))
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()

    from spatialalignmentnetwork_tpu.models.gan import NetG

    jnet = NetG(out_chans=1, layers=(4, 8))
    vs = jnet.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
                   train=False)
    pflat, sflat = TC.netg_to_flax(_sd(tnet), flatten_tree(vs["params"]).keys())
    params = _merge(vs["params"], pflat)
    stats = _merge(vs["batch_stats"], sflat)
    got = np.asarray(
        jnet.apply({"params": params, "batch_stats": stats}, jnp.asarray(x),
                   train=False)
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_varnet_parity_full_architecture():
    """The EXACT production VarNet config (8 cascades, sens 8/4, chans 18,
    pools 4, use_ref — model.py:64-71) at reduced spatial size."""
    import varnet as ref_varnet

    torch.manual_seed(10)
    kwargs = dict(num_cascades=8, sens_chans=8, sens_pools=4, chans=18,
                  pools=4)
    tnet = ref_varnet.VarNet(use_ref=True, **kwargs)
    tnet.eval()

    size, n = 64, 1
    rng = np.random.default_rng(11)
    pruned = rng.random(size) > 0.25
    pruned[:8] = False
    pruned[-8:] = False
    mask = ~pruned
    k = ((rng.standard_normal((n, 1, size, size))
          + 1j * rng.standard_normal((n, 1, size, size))).astype(np.complex64)
         * mask[None, None, None, :])
    ref_img = np.abs(rng.standard_normal((n, 1, size, size))).astype(np.float32)
    num_low = int(size * 0.25 * 0.32)  # 5 — odd-roll path included

    with torch.no_grad():
        want = tnet(
            torch.from_numpy(k), torch.from_numpy(mask[None, None, None, :]),
            torch.from_numpy(ref_img), num_low,
        ).numpy()

    from spatialalignmentnetwork_tpu.models.varnet import VarNet

    jnet = VarNet(use_ref=True, **kwargs)
    tmpl = jnet.init(jax.random.PRNGKey(0), jnp.asarray(k), jnp.asarray(mask),
                     jnp.asarray(ref_img), num_low)
    flat = TC.varnet_to_flax(_sd(tnet), num_cascades=8, sens_pools=4, pools=4)
    params = _merge(tmpl["params"], flat)
    got = np.asarray(
        jnet.apply({"params": params}, jnp.asarray(k), jnp.asarray(mask),
                   jnp.asarray(ref_img), num_low)
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_gan_parity_full_architecture():
    """Production NetG (64..512 layers) and NetD blocks (model.py:58-61) at
    reduced spatial size."""
    import gan as ref_gan

    torch.manual_seed(12)
    tG = ref_gan.NetG(in_channels=1, out_channels=1,
                      layers=(64, 128, 256, 512, 512))
    tG.eval()
    x = np.abs(_rand((1, 1, 64, 64), 13))
    with torch.no_grad():
        wantG = tG(torch.from_numpy(x)).numpy()

    from spatialalignmentnetwork_tpu.models.gan import NetG, NetD
    from spatialalignmentnetwork_tpu.engine.checkpoint import flatten_tree

    jG = NetG()  # default = production layers
    vs = jG.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x), train=False)
    p, s = TC.netg_to_flax(_sd(tG), flatten_tree(vs["params"]).keys())
    gotG = np.asarray(jG.apply(
        {"params": _merge(vs["params"], p),
         "batch_stats": _merge(vs["batch_stats"], s)},
        jnp.asarray(x), train=False,
    ))
    np.testing.assert_allclose(gotG, wantG, rtol=2e-3, atol=2e-4)

    torch.manual_seed(13)
    tD = ref_gan.NetD(in_channels=2,
                      layers=([64] * 2, [128] * 2, [256] * 2, [256] * 2,
                              [256] * 2))
    tD.eval()
    xd = _rand((1, 2, 64, 64), 14)
    with torch.no_grad():
        wantD = tD(torch.from_numpy(xd)).numpy()
    jD = NetD()
    vd = jD.init({"params": jax.random.PRNGKey(1)}, jnp.asarray(xd),
                 train=False)
    p, s = TC.netd_to_flax(_sd(tD), flatten_tree(vd["params"]).keys())
    gotD = np.asarray(jD.apply(
        {"params": _merge(vd["params"], p),
         "batch_stats": _merge(vd["batch_stats"], s)},
        jnp.asarray(xd), train=False,
    ))
    np.testing.assert_allclose(gotD, wantD, rtol=2e-3, atol=2e-4)


def _build_reference_ckpt_dir(tmp_path):
    """Reference-format checkpoint directory (per-net npz of torch state
    dicts + config JSON, basemodel.py:43-55 layout) with tiny nets.
    Returns (ref_dir, pruned, tR)."""
    import json
    import varnet as ref_varnet
    import gan as ref_gan

    torch.manual_seed(7)
    # tiny architectures; the config carries matching net_* overrides
    tR = ref_varnet.VarNet(num_cascades=2, sens_chans=4, sens_pools=2,
                           chans=4, pools=2, use_ref=True)
    tG = ref_gan.NetG(in_channels=1, out_channels=1, layers=(4, 8))
    tD = ref_gan.NetD(in_channels=2, layers=([4] * 1, [8] * 1))

    ref_dir = tmp_path / "ref_ckpt.pt"
    ref_dir.mkdir()
    for name, mod in (("net_R", tR), ("net_G", tG), ("net_D", tD)):
        sd = {k: v.detach().numpy() for k, v in mod.state_dict().items()}
        with open(ref_dir / name, "wb") as f:
            np.savez(f, **sd)
    pruned = np.zeros(16, bool)
    pruned[5:9] = True
    with open(ref_dir / "net_mask", "wb") as f:
        np.savez(f, weight=np.ones(16, np.float32), pruned=pruned)
    # sparsity 0.5 -> num_low_frequencies=2: a single ACS line (as 0.25
    # would give at this toy width) makes the sensitivity estimate
    # near-zero and the rss-normalized maps numerically chaotic in BOTH
    # frameworks — ill-posed, not a conversion property
    cfg = dict(
        sparsity=0.5, lr=1e-4, shape=16, coils=1, reg="Rec",
        mask="equispaced", weight_smooth=1000.0, weight_gan=0.1,
        weight_gan_sim=1.0, weight_sim=1.0,
        net_G_layers=[4, 8], net_D_blocks=[[4], [8]],
        net_T_layers=[4, 8], net_R_cascades=2, net_R_chans=4,
        net_R_sens_chans=4, net_R_pools=2, net_R_sens_pools=2,
    )
    with open(ref_dir / "config", "w") as f:
        json.dump(cfg, f)
    return ref_dir, pruned, tR


def _assert_loaded_model_matches_reference(net, pruned, tR):
    """The loaded CSModel carries the reference weights: pruned vector
    survived and the recon output matches the reference VarNet."""
    np.testing.assert_array_equal(np.asarray(net.state["pruned"]), pruned)
    rng = np.random.default_rng(0)
    full = jnp.asarray(
        (rng.random((2, 1, 16, 16)) + 1j * rng.random((2, 1, 16, 16))
         ).astype(np.complex64)
    )
    aux = jnp.zeros_like(full)
    net.eval()
    net.set_input(full, aux)
    ret = net.test()
    assert np.isfinite(ret)

    from spatialalignmentnetwork_tpu.ops.fft import fft2 as jfft2
    k_sampled = np.asarray(jfft2(full)) * (~pruned)[None, None, None, :]
    warped = np.asarray(net._aux["img_warped"])
    tR.eval()
    with torch.no_grad():
        want = tR(
            torch.from_numpy(k_sampled),
            torch.from_numpy((~pruned)[None, None, None, :]),
            torch.from_numpy(warped),
            net.num_low_frequencies,
        ).numpy()
    np.testing.assert_allclose(
        np.asarray(net._aux["img_rec"]), want, rtol=1e-3, atol=1e-4
    )


def test_convert_reference_checkpoint_end_to_end(tmp_path):
    """Offline conversion: convert a reference checkpoint directory, load
    the converted copy into CSModel, and run an eval step."""
    ref_dir, pruned, tR = _build_reference_ckpt_dir(tmp_path)

    from spatialalignmentnetwork_tpu.engine.torch_compat import (
        convert_reference_checkpoint,
    )

    out_dir = str(tmp_path / "converted.pt")
    convert_reference_checkpoint(str(ref_dir), out_dir)
    _assert_loaded_model_matches_reference(CSModel(ckpt=out_dir), pruned, tR)


def test_autoload_reference_checkpoint_dir(tmp_path):
    """A reference checkpoint DIRECTORY loads directly — no offline
    conversion step (basemodel.py:17-41 transparency, VERDICT missing #1)."""
    ref_dir, pruned, tR = _build_reference_ckpt_dir(tmp_path)
    _assert_loaded_model_matches_reference(
        CSModel(ckpt=str(ref_dir)), pruned, tR
    )


def test_autoload_legacy_torch_file(tmp_path):
    """A legacy single-file torch.save checkpoint loads directly
    (reference basemodel.py:18-19)."""
    import json

    ref_dir, pruned, tR = _build_reference_ckpt_dir(tmp_path)
    # re-pack the directory as the legacy single torch file
    whole = {}
    for name in ("net_R", "net_G", "net_D", "net_mask"):
        with np.load(ref_dir / name, allow_pickle=False) as z:
            whole[name] = {k: torch.from_numpy(z[k]) for k in z.files}
    with open(ref_dir / "config") as f:
        whole["config"] = json.load(f)
    legacy = tmp_path / "legacy_best.pt"
    torch.save(whole, str(legacy))
    _assert_loaded_model_matches_reference(
        CSModel(ckpt=str(legacy)), pruned, tR
    )


def test_netd_parity():
    import gan as ref_gan

    torch.manual_seed(5)
    tnet = ref_gan.NetD(in_channels=2, layers=([4] * 2, [8] * 2))
    tnet.eval()
    x = _rand((2, 2, 16, 16), 7)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()

    from spatialalignmentnetwork_tpu.models.gan import NetD

    jnet = NetD(blocks=((4,) * 2, (8,) * 2))
    vs = jnet.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
                   train=False)
    pflat, sflat = TC.netd_to_flax(_sd(tnet), flatten_tree(vs["params"]).keys())
    params = _merge(vs["params"], pflat)
    stats = _merge(vs["batch_stats"], sflat)
    got = np.asarray(
        jnet.apply({"params": params, "batch_stats": stats}, jnp.asarray(x),
                   train=False)
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_repack_cli_normalizes_both_layouts(tmp_path):
    """The in-place repack CLI (python -m ...engine.checkpoint CKPT) must
    handle BOTH loadable layouts without a pre-save delete: a directory
    is overwritten atomically by ckpt_save; a legacy single torch FILE
    (which shutil.rmtree used to crash on) is replaced only after the
    fresh directory is fully written."""
    import json
    import os
    import subprocess
    import sys

    ref_dir, pruned, tR = _build_reference_ckpt_dir(tmp_path)
    whole = {}
    for name in ("net_R", "net_G", "net_D", "net_mask"):
        with np.load(ref_dir / name, allow_pickle=False) as z:
            whole[name] = {k: torch.from_numpy(z[k]) for k in z.files}
    with open(ref_dir / "config") as f:
        whole["config"] = json.load(f)
    legacy = tmp_path / "legacy_repack.pt"
    torch.save(whole, str(legacy))

    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    for target in (str(legacy), str(ref_dir)):
        proc = subprocess.run(
            [sys.executable, "-m",
             "spatialalignmentnetwork_tpu.engine.checkpoint", target],
            env=env, cwd=repo, capture_output=True, text=True, timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-1500:]
        assert os.path.isdir(target)  # normalized to the native dir layout
    _assert_loaded_model_matches_reference(
        CSModel(ckpt=str(legacy)), pruned, tR
    )


def test_bicubic_resize_parity():
    """ops/bicubic.py matches torch interpolate(mode='bicubic',
    align_corners=False) — the reference's control-grid upsample
    (reference augment.py:45-46) — to f32 rounding, including the
    replicate border guard and both up- and down-sampling."""
    from spatialalignmentnetwork_tpu.ops.bicubic import bicubic_resize2d

    rng = np.random.default_rng(7)
    for (h, w), (oh, ow) in [
        ((9, 9), (24, 24)),       # the live control-grid shape
        ((9, 9), (320, 320)),     # flagship crop
        ((9, 9), (352, 320)),     # non-square 1.1x crop
        ((5, 7), (13, 29)),       # odd sizes
        ((16, 16), (9, 11)),      # downsample (same kernel, no antialias)
    ]:
        x = rng.standard_normal((2, 2, h, w)).astype(np.float32)
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=(oh, ow), mode="bicubic",
            align_corners=False,
        ).numpy()
        got = np.asarray(bicubic_resize2d(jnp.asarray(x), oh, ow))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)
