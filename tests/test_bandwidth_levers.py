"""Exactness tests for the round-3 HBM-traffic levers (PERF.md).

Both serving levers are algebraic re-expressions of the same math and must
be exact to float reassociation, with a param tree identical to the plain
formulation (checkpoints are layout-independent):

- one-pass instance norm (models/layers.py instance_norm, SAN_TPU_IN):
  var = E[x^2] - mean^2 with f32 stats vs the two-pass centered form.
- PairConv decoder skip joins (models/layers.py PairConv, unet.py
  _PAIR_DECODER, SAN_TPU_PAIRCONV): conv over an implicit concat as the
  sum of two kernel-sliced convs.
"""

import jax
import jax.numpy as jnp
import numpy as np

import spatialalignmentnetwork_tpu.models.unet as unet_mod
from spatialalignmentnetwork_tpu.models import layers
from spatialalignmentnetwork_tpu.models.layers import PairConv, instance_norm
from spatialalignmentnetwork_tpu.models.unet import Unet


def _rand(shape, seed=0, scale=1.0, offset=0.0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape) * scale + offset,
        jnp.float32,
    )


def _with_flag(module, name, value, fn):
    old = getattr(module, name)
    setattr(module, name, value)
    try:
        return fn()
    finally:
        setattr(module, name, old)


def test_instance_norm_one_pass_matches_two_pass():
    # offset mean + scale stress the E[x^2]-mean^2 cancellation
    x = _rand((2, 17, 13, 5), seed=1, scale=3.0, offset=7.0)
    one = _with_flag(layers, "_IN_ONE_PASS", True, lambda: instance_norm(x))
    two = _with_flag(layers, "_IN_ONE_PASS", False, lambda: instance_norm(x))
    np.testing.assert_allclose(np.asarray(one), np.asarray(two), atol=2e-5)


def test_instance_norm_one_pass_zero_variance_finite_grad():
    # constant planes: var==0 must not NaN the value or the gradient
    x = jnp.ones((1, 4, 4, 2), jnp.float32) * 5.0

    def f(x):
        return jnp.sum(instance_norm(x) ** 2)

    val, grad = jax.value_and_grad(f)(x)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()


def test_pairconv_matches_concat_conv():
    a, b = _rand((2, 9, 11, 4), seed=2), _rand((2, 9, 11, 6), seed=3)
    mod = PairConv(5, (3, 3), use_bias=False)
    p = mod.init(jax.random.PRNGKey(0), (a, b))
    y = mod.apply(p, (a, b))
    k = p["params"]["kernel"]
    ref = jax.lax.conv_general_dilated(
        jnp.concatenate([a, b], axis=-1), k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert k.shape == (3, 3, 10, 5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)


def test_unet_pair_decoder_matches_concat_fwd_grad_and_params():
    x = _rand((2, 24, 24, 3), seed=4)
    net = Unet(out_chans=2, chans=6, num_pool_layers=3)

    def run(flag):
        return _with_flag(
            unet_mod, "_PAIR_DECODER", flag,
            lambda: net.init(jax.random.PRNGKey(1), x),
        )

    p_pair, p_cat = run(True), run(False)
    # identical param tree and init values: checkpoints are interchangeable
    assert jax.tree_util.tree_structure(p_pair) == \
        jax.tree_util.tree_structure(p_cat)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_pair), jax.tree_util.tree_leaves(p_cat)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss(flag):
        def f(p):
            return jnp.sum(
                _with_flag(
                    unet_mod, "_PAIR_DECODER", flag,
                    lambda: net.apply(p, x),
                ) ** 2
            )
        return f

    y_pair = _with_flag(unet_mod, "_PAIR_DECODER", True,
                        lambda: net.apply(p_pair, x))
    y_cat = _with_flag(unet_mod, "_PAIR_DECODER", False,
                       lambda: net.apply(p_pair, x))
    np.testing.assert_allclose(
        np.asarray(y_pair), np.asarray(y_cat), atol=5e-5, rtol=5e-5
    )
    g_pair = jax.grad(loss(True))(p_pair)
    g_cat = jax.grad(loss(False))(p_pair)
    for (k0, a), (k1, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_pair),
        jax.tree_util.tree_leaves_with_path(g_cat),
    ):
        assert k0 == k1
        a, b = np.asarray(a), np.asarray(b)
        err = np.linalg.norm(b - a) / (np.linalg.norm(a) + 1e-12)
        assert err < 1e-4, (str(k0), err)


def test_unet_pair_decoder_odd_sizes_pad_path():
    # odd spatial sizes exercise the reflect-pad branch ahead of the pair
    # join (pad applies to x only, never the skip)
    x = _rand((1, 21, 19, 3), seed=5)
    net = Unet(out_chans=1, chans=4, num_pool_layers=2)
    p = net.init(jax.random.PRNGKey(2), x)
    y_pair = _with_flag(unet_mod, "_PAIR_DECODER", True,
                        lambda: net.apply(p, x))
    y_cat = _with_flag(unet_mod, "_PAIR_DECODER", False,
                       lambda: net.apply(p, x))
    assert y_pair.shape == (1, 21, 19, 1)
    np.testing.assert_allclose(
        np.asarray(y_pair), np.asarray(y_cat), atol=5e-5, rtol=5e-5
    )


def test_group_norm_2_one_pass_matches_two_pass():
    from spatialalignmentnetwork_tpu.models.unet import (
        group_norm_2,
        group_norm_2_nhwc,
    )

    x = _rand((2, 4, 12, 10), seed=6, scale=2.0, offset=-3.0)
    one = _with_flag(layers, "_IN_ONE_PASS", True, lambda: group_norm_2(x))
    two = _with_flag(layers, "_IN_ONE_PASS", False, lambda: group_norm_2(x))
    for a, b in zip(one, two):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    xh = _rand((2, 12, 10, 6), seed=7, scale=2.0, offset=5.0)
    one = _with_flag(
        layers, "_IN_ONE_PASS", True, lambda: group_norm_2_nhwc(xh)
    )
    two = _with_flag(
        layers, "_IN_ONE_PASS", False, lambda: group_norm_2_nhwc(xh)
    )
    for a, b in zip(one, two):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_group_norm_2_zero_variance_guard_one_pass():
    from spatialalignmentnetwork_tpu.models.unet import group_norm_2

    x = jnp.ones((1, 4, 6, 6), jnp.float32) * 3.0

    def f(x):
        xn, mean, std = group_norm_2(x)
        return jnp.sum(xn ** 2) + jnp.sum(std)

    val, grad = jax.value_and_grad(f)(x)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()


def test_group_norm_2_keeps_compute_dtype():
    from spatialalignmentnetwork_tpu.models.unet import group_norm_2

    x = _rand((1, 4, 8, 8), seed=8).astype(jnp.bfloat16)
    xn, mean, std = group_norm_2(x)
    # f32 stat accumulation must not promote the normalized activation
    assert xn.dtype == jnp.bfloat16
    assert mean.dtype == jnp.bfloat16 and std.dtype == jnp.bfloat16
