"""Parity tests for affine_grid / grid_sample vs torch (align_corners=False)."""

import pytest
import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from spatialalignmentnetwork_tpu.ops import grid_sample as G


def _rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_affine_grid_identity_matches_torch():
    theta = np.array([[[1, 0, 0], [0, 1, 0]]], dtype=np.float32)
    size = (1, 1, 5, 7)
    got = np.asarray(G.affine_grid(jnp.asarray(theta), size))
    want = F.affine_grid(torch.from_numpy(theta), size, align_corners=False).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_affine_grid_general_matches_torch():
    rng = np.random.default_rng(1)
    theta = (rng.standard_normal((3, 2, 3)) * 0.3).astype(np.float32)
    size = (3, 2, 8, 6)
    got = np.asarray(G.affine_grid(jnp.asarray(theta), size))
    want = F.affine_grid(torch.from_numpy(theta), size, align_corners=False).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def _check_sample(padding_mode, seed, scale=1.0):
    img = _rand((2, 3, 9, 11), seed)
    grid = (_rand((2, 5, 6, 2), seed + 100) * scale).astype(np.float32)
    got = np.asarray(
        G.grid_sample(jnp.asarray(img), jnp.asarray(grid), padding_mode=padding_mode)
    )
    want = F.grid_sample(
        torch.from_numpy(img),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode=padding_mode,
        align_corners=False,
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_grid_sample_zeros_in_range():
    _check_sample("zeros", 0, scale=0.9)


def test_grid_sample_zeros_out_of_range():
    _check_sample("zeros", 1, scale=2.5)


def test_grid_sample_reflection():
    _check_sample("reflection", 2, scale=2.5)


def test_grid_sample_border():
    _check_sample("border", 3, scale=2.5)


def test_grid_sample_identity_grid_is_identity():
    img = _rand((1, 2, 16, 16), 4)
    grid = G.identity_grid((1, 2, 16, 16))
    out = np.asarray(G.grid_sample(jnp.asarray(img), grid))
    np.testing.assert_allclose(out, img, rtol=1e-5, atol=1e-5)


def test_grid_sample_grads_flow_to_image_and_grid():
    img = jnp.asarray(_rand((1, 1, 8, 8), 5))
    grid = G.identity_grid((1, 1, 8, 8)) + 0.01

    def loss(im, gr):
        return jnp.sum(G.grid_sample(im, gr) ** 2)

    gi, gg = jax.grad(loss, argnums=(0, 1))(img, grid)
    assert np.abs(np.asarray(gi)).sum() > 0
    assert np.abs(np.asarray(gg)).sum() > 0
    # parity of gradients vs torch
    timg = torch.from_numpy(np.asarray(img)).requires_grad_(True)
    tgrid = torch.from_numpy(np.asarray(grid)).requires_grad_(True)
    tout = F.grid_sample(timg, tgrid, align_corners=False)
    (tout**2).sum().backward()
    np.testing.assert_allclose(np.asarray(gi), timg.grad.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gg), tgrid.grad.numpy(), rtol=1e-4, atol=1e-4)


def test_warp_complex():
    img = (_rand((1, 1, 8, 8), 6) + 1j * _rand((1, 1, 8, 8), 7)).astype(np.complex64)
    grid = G.identity_grid((1, 1, 8, 8))
    out = np.asarray(G.warp(jnp.asarray(img), grid))
    np.testing.assert_allclose(out, img, rtol=1e-5, atol=1e-5)


def test_grid_sample_complex_input_planar_split():
    """Complex images sample as independent real/imag planes (torch
    grid_sample is real-only; the reference splits at augment.py:62-64 —
    the op does the split itself instead of crashing on jnp.floor)."""
    rng = np.random.default_rng(3)
    img = (rng.random((2, 1, 12, 12)) + 1j * rng.random((2, 1, 12, 12))
           ).astype(np.complex64)
    grid = jnp.asarray(
        rng.uniform(-1.05, 1.05, (2, 12, 12, 2)).astype(np.float32)
    )
    out = G.grid_sample(jnp.asarray(img), grid, impl="jnp")
    want_re = G.grid_sample(jnp.asarray(img.real), grid, impl="jnp")
    want_im = G.grid_sample(jnp.asarray(img.imag), grid, impl="jnp")
    assert jnp.iscomplexobj(out)
    np.testing.assert_allclose(np.asarray(out.real), np.asarray(want_re),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.imag), np.asarray(want_im),
                               rtol=1e-6, atol=1e-6)


def test_grid_sample_integer_input_rejected():
    img = jnp.zeros((1, 1, 8, 8), jnp.int32)
    grid = jnp.zeros((1, 8, 8, 2), jnp.float32)
    with pytest.raises(TypeError, match="float"):
        G.grid_sample(img, grid, impl="jnp")
