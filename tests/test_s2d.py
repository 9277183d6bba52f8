"""Exactness tests for the space-to-depth conv execution layout.

models/s2d.py re-expresses the UNets' stride-1 3x3 convs as 2x2-cell convs
over the s2d layout (the MXU lane-efficiency lever, PERF.md round 3). Every
transform is an algebraic re-indexing of the same multiply-accumulates, so
the s2d path must match the plain path to float reassociation — these tests
pin that, layer by layer and end-to-end (fwd + grad), plus the contract
that both layouts share ONE parameter tree (same paths, same init values:
checkpoints are layout-independent).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatialalignmentnetwork_tpu.models.s2d import (
    concat_s2d,
    conv3x3_s2d,
    depth_to_space,
    instance_norm_s2d,
    phase_mean_pool,
    space_to_depth,
)
from spatialalignmentnetwork_tpu.models.layers import (
    avg_pool2,
    instance_norm,
)
from spatialalignmentnetwork_tpu.models.unet import NormUnet, Unet
from spatialalignmentnetwork_tpu.models.varnet import VarNet


def _rand(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32
    )


def test_s2d_roundtrip_and_layout():
    x = _rand((2, 8, 6, 3))
    y = space_to_depth(x)
    assert y.shape == (2, 4, 3, 12)
    # phase-major definition: channel (2p+q)*C + c holds pixel (2I+p, 2J+q)
    for p in range(2):
        for q in range(2):
            np.testing.assert_array_equal(
                np.asarray(y[..., (2 * p + q) * 3:(2 * p + q + 1) * 3]),
                np.asarray(x[:, p::2, q::2, :]),
            )
    np.testing.assert_array_equal(np.asarray(depth_to_space(y)), np.asarray(x))


@pytest.mark.parametrize("h,w,ci,co", [(12, 12, 3, 5), (10, 14, 18, 18), (6, 6, 1, 4)])
def test_conv3x3_s2d_matches_plain(h, w, ci, co):
    x = _rand((2, h, w, ci), seed=1)
    k = _rand((3, 3, ci, co), seed=2) / (3 * np.sqrt(ci))
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = depth_to_space(conv3x3_s2d(space_to_depth(x), k))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_pool_norm_concat_equivalences():
    x = _rand((2, 8, 12, 6), seed=3)
    xs = space_to_depth(x)
    np.testing.assert_allclose(
        np.asarray(phase_mean_pool(xs)), np.asarray(avg_pool2(x)),
        atol=1e-6, rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(depth_to_space(instance_norm_s2d(xs))),
        np.asarray(instance_norm(x)),
        atol=1e-5, rtol=1e-5,
    )
    b = _rand((2, 8, 12, 4), seed=4)
    np.testing.assert_array_equal(
        np.asarray(concat_s2d(xs, space_to_depth(b))),
        np.asarray(space_to_depth(jnp.concatenate([x, b], axis=-1))),
    )


@pytest.mark.parametrize("levels", [1, 2, 4])
def test_unet_s2d_matches_plain(levels):
    """Full U-Net: identical param tree, fwd and grads match the plain
    layout for every s2d depth."""
    x = _rand((2, 32, 32, 3), seed=5)
    plain = Unet(out_chans=2, chans=6, num_pool_layers=4)
    s2d = Unet(out_chans=2, chans=6, num_pool_layers=4, s2d_levels=levels)
    params = plain.init(jax.random.PRNGKey(0), x)
    params_s2d = s2d.init(jax.random.PRNGKey(0), x)
    # one parameter tree serves both layouts: same paths, same values
    la = jax.tree_util.tree_leaves(params)
    lb = jax.tree_util.tree_leaves(params_s2d)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    y0 = plain.apply(params, x)
    y1 = s2d.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), atol=2e-5, rtol=2e-5
    )

    def loss(fn):
        def f(p):
            return jnp.sum(fn.apply(p, x) ** 2)
        return jax.grad(f)(params)

    g0, g1 = loss(plain), loss(s2d)
    for (k0, a), (k1, b) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
    ):
        assert k0 == k1
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-4,
            err_msg=str(k0),
        )


def test_unet_s2d_odd_size_falls_back():
    """Odd entering sizes skip s2d per level instead of crashing."""
    x = _rand((1, 18, 18, 2), seed=6)  # 18 -> 9 (odd) at level 1
    net = Unet(out_chans=2, chans=4, num_pool_layers=3, s2d_levels=3)
    params = net.init(jax.random.PRNGKey(1), x)
    y = net.apply(params, x)
    ref = Unet(out_chans=2, chans=4, num_pool_layers=3).apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_normunet_s2d_matches_plain():
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, 1, 24, 24))
        + 1j * np.random.default_rng(8).standard_normal((2, 1, 24, 24)),
        jnp.complex64,
    )
    ref_img = _rand((2, 1, 24, 24), seed=9)
    plain = NormUnet(chans=6, num_pools=3, use_ref=True)
    s2d = NormUnet(chans=6, num_pools=3, use_ref=True, s2d_levels=2)
    params = plain.init(jax.random.PRNGKey(2), x, ref_img)
    y0 = plain.apply(params, x, ref_img)
    y1 = s2d.apply(params, x, ref_img)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), atol=3e-5, rtol=3e-5
    )


@pytest.mark.parametrize("coils", [1, 3])
def test_varnet_s2d_matches_plain(coils):
    """End-to-end VarNet (sens model + cascades): s2d == plain, fwd+grad."""
    rng = np.random.default_rng(10)
    h = w = 32
    k = jnp.asarray(
        rng.standard_normal((2, coils, h, w))
        + 1j * rng.standard_normal((2, coils, h, w)),
        jnp.complex64,
    )
    mask = jnp.asarray(rng.random(w) < 0.4)
    ref = jnp.asarray(rng.standard_normal((2, coils, h, w)), jnp.float32)
    kw = dict(num_cascades=2, sens_chans=4, sens_pools=2, chans=6, pools=3,
              use_ref=True)
    plain = VarNet(**kw)
    s2d = VarNet(s2d_levels=2, **kw)
    params = plain.init(jax.random.PRNGKey(3), k, mask, ref, 4)
    y0 = plain.apply(params, k, mask, ref, 4)
    y1 = s2d.apply(params, k, mask, ref, 4)
    # f32 reassociation drift only (the plain path additionally runs
    # PairConv skip joins + one-pass IN; rsqrt amplifies tiny variance
    # deltas across cascades) — exactness is pinned in f64 below
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), atol=5e-4, rtol=5e-4
    )

    def loss(net):
        def f(p):
            return jnp.sum(net.apply(p, k, mask, ref, 4) ** 2)
        return jax.grad(f)(params)

    g0, g1 = loss(plain), loss(s2d)
    for (k0, a), (k1, b) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
    ):
        assert k0 == k1
        # norm-relative: end-to-end reassociation through 2 cascades can
        # shift individual elements by ~0.5% while the leaf agrees
        a, b = np.asarray(a), np.asarray(b)
        # f32 end-to-end reassociation noise only — the rigorous
        # equivalence proof is test_varnet_s2d_exact_f64 below
        err = np.linalg.norm(b - a) / (np.linalg.norm(a) + 1e-12)
        assert err < 2e-2, (str(k0), err)


def test_varnet_s2d_exact_f64():
    """In f64 the s2d path matches the plain path to ~1e-13 (fwd and every
    grad leaf): the transform is an exact algebraic re-indexing, and the
    f32 tolerances above are purely rounding reassociation."""
    from jax import config as _cfg

    _cfg.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(10)
        coils, h, w = 3, 32, 32
        k = jnp.asarray(
            rng.standard_normal((2, coils, h, w))
            + 1j * rng.standard_normal((2, coils, h, w)), jnp.complex128,
        )
        mask = jnp.asarray(rng.random(w) < 0.4)
        ref = jnp.asarray(rng.standard_normal((2, coils, h, w)), jnp.float64)
        kw = dict(num_cascades=2, sens_chans=4, sens_pools=2, chans=6,
                  pools=3, use_ref=True, dtype=jnp.float64)
        plain = VarNet(**kw)
        s2d = VarNet(s2d_levels=2, **kw)
        params = plain.init(jax.random.PRNGKey(3), k, mask, ref, 4)
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64), params
        )
        y0 = plain.apply(params, k, mask, ref, 4)
        y1 = s2d.apply(params, k, mask, ref, 4)
        assert float(jnp.max(jnp.abs(y0 - y1))) < 1e-12

        g0 = jax.grad(
            lambda p: jnp.sum(plain.apply(p, k, mask, ref, 4) ** 2)
        )(params)
        g1 = jax.grad(
            lambda p: jnp.sum(s2d.apply(p, k, mask, ref, 4) ** 2)
        )(params)
        for (k0, a), (k1, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1),
        ):
            a, b = np.asarray(a), np.asarray(b)
            err = np.linalg.norm(b - a) / (np.linalg.norm(a) + 1e-300)
            assert err < 1e-10, (str(k0), err)
    finally:
        _cfg.update("jax_enable_x64", False)
