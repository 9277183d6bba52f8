"""Shape, gradient, and semantic tests for the network zoo."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from spatialalignmentnetwork_tpu.models.unet import Unet, NormUnet, group_norm_2, pad_to_16, unpad_16
from spatialalignmentnetwork_tpu.models.varnet import VarNet, acs_mask
from spatialalignmentnetwork_tpu.models.stn import SpatialTransformer, warp, gradient_loss
from spatialalignmentnetwork_tpu.models.gan import NetG, NetD, loss_gan
from spatialalignmentnetwork_tpu.models.unet_lib import LibUNet, ResNet


def _rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def _randc(shape, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
        np.complex64
    )


def test_unet_shapes():
    net = Unet(out_chans=2, chans=4, num_pool_layers=3)
    x = jnp.asarray(_rand((2, 32, 32, 3)))
    params = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(params, x)
    assert y.shape == (2, 32, 32, 2)


def test_group_norm_2_matches_torch_semantics():
    x = _rand((3, 2, 8, 8), 1)
    got, mean, std = group_norm_2(jnp.asarray(x))
    t = torch.from_numpy(x)
    b, c, h, w = t.shape
    tv = t.view(b, 2, c // 2 * h * w)
    tmean = tv.mean(dim=2).view(b, 2, 1, 1)
    tstd = tv.std(dim=2).view(b, 2, 1, 1)  # unbiased
    want = (t - tmean) / (tstd + 1e-6)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mean), tmean.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(std), tstd.numpy(), rtol=1e-4, atol=1e-6)


def test_pad_to_16_roundtrip():
    x = jnp.asarray(_rand((1, 2, 30, 45), 2))
    padded, info = pad_to_16(x)
    assert padded.shape[-2] % 16 == 0 and padded.shape[-1] % 16 == 0
    assert padded.shape[-2:] == (32, 48)
    back = unpad_16(padded, *info)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_normunet_shape_and_complex():
    net = NormUnet(chans=4, num_pools=2, use_ref=True)
    x = jnp.asarray(_randc((2, 1, 24, 24), 3))
    ref = jnp.asarray(np.abs(_rand((2, 1, 24, 24), 4)))
    params = net.init(jax.random.PRNGKey(0), x, ref)
    y = net.apply(params, x, ref)
    assert y.shape == x.shape and jnp.iscomplexobj(y)


def test_acs_mask_layout():
    m = np.asarray(acs_mask(16, 4))
    # 4 low-freq lines rolled by -2: kept at borders {14, 15, 0, 1}
    assert m.sum() == 4
    assert m[14] == m[15] == m[0] == m[1] == 1.0


@pytest.mark.slow
def test_varnet_forward_and_grad():
    net = VarNet(num_cascades=2, sens_chans=2, sens_pools=2, chans=4, pools=2,
                 use_ref=True)
    k = jnp.asarray(_randc((1, 1, 32, 32), 5))
    mask = jnp.asarray(np.random.default_rng(6).random(32) > 0.5)
    ref = jnp.asarray(np.abs(_rand((1, 1, 32, 32), 7)))
    params = net.init(jax.random.PRNGKey(0), k, mask, ref, 4)
    out = net.apply(params, k, mask, ref, 4)
    assert out.shape == (1, 1, 32, 32) and not jnp.iscomplexobj(out)

    def loss(p):
        return jnp.sum(net.apply(p, k, mask, ref, 4) ** 2)

    g = jax.grad(loss)(params)
    gsum = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gsum) and gsum > 0
    # per-cascade params are stacked along a leading scan axis
    dc = params["params"]["ScanVarNetBlock_0"]["dc_weight"] \
        if "ScanVarNetBlock_0" in params["params"] else None
    if dc is None:  # name depends on flax scan wrapper naming
        flat = jax.tree_util.tree_leaves_with_path(params)
        dc = [l for p, l in flat if "dc_weight" in jax.tree_util.keystr(p)][0]
    assert dc.shape[0] == 2


def test_varnet_planar_matches_standard(monkeypatch):
    """The planar-NHWC cascade (layout-only redesign, PERF.md lever) is
    numerically equivalent to the standard complex path with the SAME
    parameters — forward and gradient.

    Pinned to the two-pass instance norm: the test isolates LAYOUT
    equivalence, and the one-pass IN's E[x^2]-mean^2 cancellation term
    compounds with the PairConv reassociation across layout transposes
    just enough to cross the f32 grad tolerance (each lever alone stays
    within it; both levers have their own exactness tests in
    test_bandwidth_levers.py incl. the f64 proof in test_s2d.py)."""
    from spatialalignmentnetwork_tpu.models import layers as _layers

    monkeypatch.setattr(_layers, "_IN_ONE_PASS", False)
    kw = dict(num_cascades=2, sens_chans=2, sens_pools=2, chans=4, pools=2,
              use_ref=True)
    net_std = VarNet(**kw)
    net_pl = VarNet(planar=True, **kw)
    k = jnp.asarray(_randc((2, 1, 32, 32), 5))
    mask = jnp.asarray(np.random.default_rng(6).random(32) > 0.5)
    ref = jnp.asarray(np.abs(_rand((2, 1, 32, 32), 7)))

    params = net_std.init(jax.random.PRNGKey(0), k, mask, ref, 4)
    params_pl = net_pl.init(jax.random.PRNGKey(0), k, mask, ref, 4)
    # identical parameter trees: checkpoints cross-load freely
    assert jax.tree_util.tree_structure(params) == (
        jax.tree_util.tree_structure(params_pl)
    )
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params_pl)):
        assert a.shape == b.shape

    want = net_std.apply(params, k, mask, ref, 4)
    got = net_pl.apply(params, k, mask, ref, 4)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )

    def loss(fn, p, r):
        return jnp.sum(fn.apply(p, k, mask, r, 4) ** 2)

    g_std = jax.grad(lambda r: loss(net_std, params, r))(ref)
    g_pl = jax.grad(lambda r: loss(net_pl, params, r))(ref)
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_std), rtol=2e-3, atol=2e-4
    )


def test_varnet_planar_multicoil():
    """Planar coil folding (C>1) matches the standard path."""
    kw = dict(num_cascades=1, sens_chans=2, sens_pools=2, chans=4, pools=2,
              use_ref=False)
    net_std = VarNet(**kw)
    net_pl = VarNet(planar=True, **kw)
    k = jnp.asarray(_randc((2, 3, 32, 32), 9))
    mask = jnp.asarray(np.random.default_rng(1).random(32) > 0.4)
    params = net_std.init(jax.random.PRNGKey(2), k, mask, None, 4)
    want = net_std.apply(params, k, mask, None, 4)
    got = net_pl.apply(params, k, mask, None, 4)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


@pytest.mark.slow
def test_varnet_use_ref_false():
    net = VarNet(num_cascades=1, sens_chans=2, sens_pools=2, chans=4, pools=2,
                 use_ref=False)
    k = jnp.asarray(_randc((1, 1, 16, 16), 8))
    mask = jnp.asarray(np.ones(16, dtype=bool))
    params = net.init(jax.random.PRNGKey(0), k, mask, None, 4)
    out = net.apply(params, k, mask, None, 4)
    assert out.shape == (1, 1, 16, 16)


@pytest.mark.slow
def test_stn_identity_at_init_and_grad_flow():
    stn = SpatialTransformer(channels=1, layers=(4, 8, 8))
    mov = jnp.asarray(np.abs(_rand((2, 1, 16, 16), 9)))
    fix = jnp.asarray(np.abs(_rand((2, 1, 16, 16), 10)))
    vs = stn.init({"params": jax.random.PRNGKey(0)}, mov, fix, train=False)
    (offset, grid), _ = stn.apply(vs, mov, fix, train=True, mutable=["batch_stats"])
    assert offset.shape == (2, 16, 16, 2)
    assert float(jnp.abs(offset).max()) == 0.0  # zero-init head
    w = warp(mov, grid)
    np.testing.assert_allclose(np.asarray(w), np.asarray(mov), rtol=1e-5, atol=1e-5)
    assert float(gradient_loss(offset)) == 0.0

    def loss(p):
        (off, gr), _ = stn.apply(
            {**vs, "params": p}, mov, fix, train=True, mutable=["batch_stats"]
        )
        return jnp.sum(warp(mov, gr) ** 2) + gradient_loss(off)

    g = jax.grad(loss)(vs["params"])
    gsum = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gsum) and gsum > 0


def test_netg_netd_shapes_and_loss():
    g = NetG(layers=(4, 8, 8))
    x = jnp.asarray(np.abs(_rand((2, 1, 32, 32), 11)))
    vg = g.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    out, updates = g.apply(vg, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 1, 32, 32)
    assert "batch_stats" in updates

    d = NetD(blocks=((4,) * 2, (8,) * 2))
    xd = jnp.concatenate([x, jnp.zeros_like(x)], axis=1)
    vd = d.init({"params": jax.random.PRNGKey(2)}, xd, train=False)
    outd, _ = d.apply(vd, xd, train=True, mutable=["batch_stats"])
    # one inter-block pool + 1-chan head
    assert outd.shape == (2, 1, 16, 16)

    # hinge-loss semantics
    p = jnp.asarray(np.array([[[[2.0]]]], dtype=np.float32))
    assert float(loss_gan(p, real=True, D_loss=True)) == -1.0  # clamped
    assert float(loss_gan(p, real=False, D_loss=True)) == 2.0
    assert float(loss_gan(p, real=False, D_loss=False)) == -2.0


def test_spectral_norm_constrains_weights():
    """After several updates the conv weight spectral norm estimate is ~1."""
    g = NetD(blocks=((4,),))
    x = jnp.asarray(_rand((1, 1, 8, 8), 12) * 10)
    vs = g.init({"params": jax.random.PRNGKey(3)}, x, train=False)
    stats = vs.get("batch_stats", {})
    for _ in range(5):
        _, upd = g.apply(
            {"params": vs["params"], "batch_stats": stats},
            x, train=True, mutable=["batch_stats"],
        )
        stats = upd["batch_stats"]
    # the constraint itself, not just that state exists: after power
    # iterations every stored (u, v) pair's sigma estimate approaches the
    # kernel's TRUE top singular value, so the applied weight w/sigma is
    # ~1-Lipschitz (gan.py:59-81 torch spectral_norm semantics)
    from spatialalignmentnetwork_tpu.engine.checkpoint import flatten_tree

    params_flat = flatten_tree(vs["params"])
    stats_flat = flatten_tree(stats)
    checked = 0
    for key, u in stats_flat.items():
        if not key.endswith("/u"):
            continue
        base = key[: -len("/u")]
        v = np.asarray(stats_flat[base + "/v"])
        kernel = np.asarray(params_flat[base + "/kernel"])
        kh, kw, cin, cout = kernel.shape
        w_mat = kernel.transpose(3, 2, 0, 1).reshape(cout, kh * kw * cin)
        sigma_est = float(np.asarray(u) @ w_mat @ v)
        sigma_true = float(np.linalg.svd(w_mat, compute_uv=False)[0])
        # 5 power iterations on xavier-init kernels converge well
        assert 0.8 * sigma_true < sigma_est <= sigma_true * (1 + 1e-5), (
            base, sigma_est, sigma_true,
        )
        # the applied weight's top singular value is ~1
        assert abs(
            float(np.linalg.svd(w_mat / sigma_est, compute_uv=False)[0]) - 1.0
        ) < 0.25
        checked += 1
    assert checked > 0


def test_libunet_and_resnet_shapes():
    net = LibUNet(out_chans=2, layers=(4, 8, 8))
    x = jnp.asarray(_rand((1, 16, 16, 3), 13))
    vs = net.init({"params": jax.random.PRNGKey(4)}, x, train=False)
    y, _ = net.apply(vs, x, train=True, mutable=["batch_stats"])
    assert y.shape == (1, 16, 16, 2)

    rn = ResNet(out_chans=1, channels=(4, 8, 8, 4), res=True)
    vr = rn.init(jax.random.PRNGKey(5), x)
    z = rn.apply(vr, x)
    assert z.shape == (1, 16, 16, 1)


def test_varnet_remat_policy_dots_matches_full(monkeypatch):
    """SAN_TPU_REMAT=dots (save dot_general outputs in the cascade-body
    remat instead of recomputing everything) is a scheduling choice only:
    forward and gradients must match the default 'full' policy — the saved
    values are the very values the forward computed."""
    kw = dict(num_cascades=2, sens_chans=2, sens_pools=2, chans=4, pools=2,
              use_ref=True, remat=True)
    net = VarNet(**kw)
    k = jnp.asarray(_randc((1, 1, 32, 32), 15))
    mask = jnp.asarray(np.random.default_rng(16).random(32) > 0.5)
    ref = jnp.asarray(np.abs(_rand((1, 1, 32, 32), 17)))
    params = net.init(jax.random.PRNGKey(2), k, mask, ref, 4)

    def loss(p):
        return jnp.sum(net.apply(p, k, mask, ref, 4) ** 2)

    monkeypatch.delenv("SAN_TPU_REMAT", raising=False)
    out_full = jax.jit(loss)(params)
    g_full = jax.jit(jax.grad(loss))(params)
    monkeypatch.setenv("SAN_TPU_REMAT", "dots")
    out_dots = jax.jit(loss)(params)
    g_dots = jax.jit(jax.grad(loss))(params)

    np.testing.assert_allclose(np.asarray(out_full), np.asarray(out_dots),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_full),
                    jax.tree_util.tree_leaves(g_dots)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # strict lever parsing: a typo must error at trace time, not silently
    # pick a policy (same policy as the other SAN_TPU_* levers)
    monkeypatch.setenv("SAN_TPU_REMAT", "ddots")
    with pytest.raises(ValueError, match="SAN_TPU_REMAT"):
        loss(params)


def test_kspace_bf16_lever(monkeypatch):
    """SAN_TPU_KSPACE=bf16 (quantize the cascade k-space chain; the
    measured answer to the HBM audit's 'f32 k-space is a 0.1 dB risk
    call', PERF.md round-5): outputs must stay finite and close to the
    f32 chain in BOTH layouts, the complex and planar variants must agree
    with each other, and a typo must raise, not silently pick f32."""
    kw = dict(num_cascades=2, sens_chans=2, sens_pools=2, chans=4, pools=2,
              use_ref=True)
    k = jnp.asarray(_randc((1, 1, 32, 32), 5))
    mask = jnp.asarray(np.random.default_rng(6).random(32) > 0.5)
    ref = jnp.asarray(np.abs(_rand((1, 1, 32, 32), 7)))

    net = VarNet(**kw)
    net_pl = VarNet(planar=True, **kw)
    params = net.init(jax.random.PRNGKey(0), k, mask, ref, 4)

    monkeypatch.delenv("SAN_TPU_KSPACE", raising=False)
    want = np.asarray(jax.jit(
        lambda p: net.apply(p, k, mask, ref, 4))(params))

    monkeypatch.setenv("SAN_TPU_KSPACE", "bf16")
    got = np.asarray(jax.jit(
        lambda p: net.apply(p, k, mask, ref, 4))(params))
    got_pl = np.asarray(jax.jit(
        lambda p: net_pl.apply(p, k, mask, ref, 4))(params))
    assert np.isfinite(got).all() and np.isfinite(got_pl).all()
    # bf16 has ~3 decimal digits; the 2-cascade chain stays within ~1%
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 2e-2 * scale, (
        np.abs(got - want).max(), scale)
    np.testing.assert_allclose(got_pl, got, rtol=0, atol=2e-2 * scale)

    monkeypatch.setenv("SAN_TPU_KSPACE", "half")
    with pytest.raises(ValueError, match="SAN_TPU_KSPACE"):
        jax.jit(lambda p: net.apply(p, k, mask, ref, 4))(params)


def test_upsample_nearest2_exact():
    """upsample_nearest2's two-stage formulation (H broadcast-collapse +
    W channel-interleave reshape, chosen so no TPU temp carries a size-2
    minormost-pair dim — the b32 OOM offender, docs/perf_ab_r04.jsonl)
    must still be EXACT nearest-neighbor: every output pixel a bitwise
    copy of its source."""
    from spatialalignmentnetwork_tpu.models.layers import upsample_nearest2

    for shape, seed in (((3, 5, 7, 6), 0), ((1, 1, 1, 1), 1),
                        ((2, 8, 8, 3), 2)):
        x = _rand(shape, seed)
        got = np.asarray(jax.jit(upsample_nearest2)(jnp.asarray(x)))
        want = np.repeat(np.repeat(x, 2, axis=1), 2, axis=2)
        assert got.shape == want.shape
        np.testing.assert_array_equal(got, want)
