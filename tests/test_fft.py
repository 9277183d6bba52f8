"""Golden tests for signal primitives vs torch reference semantics."""

import numpy as np
import torch
import jax.numpy as jnp

from spatialalignmentnetwork_tpu.ops import fft2, ifft2, fftshift2, ifftshift2, rss
from spatialalignmentnetwork_tpu.ops import center_crop


def _rand_c(shape, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
        np.complex64
    )


def test_fft2_matches_torch_ortho():
    x = _rand_c((2, 3, 16, 20))
    got = np.asarray(fft2(jnp.asarray(x)))
    want = torch.fft.fft2(torch.from_numpy(x), norm="ortho").numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ifft2_roundtrip():
    x = _rand_c((1, 2, 32, 32), seed=1)
    got = np.asarray(ifft2(fft2(jnp.asarray(x))))
    np.testing.assert_allclose(got, x, rtol=1e-5, atol=1e-5)


def test_matmul_dft_matches_fft():
    from spatialalignmentnetwork_tpu.ops import fft as F

    x = _rand_c((2, 2, 24, 20), seed=7)
    prev = F._FFT_IMPL  # restore the session's configured impl, not "auto"
    try:
        F.set_fft_impl("matmul")
        got_f = np.asarray(F.fft2(jnp.asarray(x)))
        got_i = np.asarray(F.ifft2(jnp.asarray(x)))
    finally:
        F.set_fft_impl(prev)
    want_f = np.fft.fft2(x, norm="ortho")
    want_i = np.fft.ifft2(x, norm="ortho")
    np.testing.assert_allclose(got_f, want_f, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_i, want_i, rtol=1e-4, atol=1e-5)
    # unitarity round-trip
    try:
        F.set_fft_impl("matmul")
        rt = np.asarray(F.ifft2(F.fft2(jnp.asarray(x))))
    finally:
        F.set_fft_impl(prev)
    np.testing.assert_allclose(rt, x, rtol=1e-4, atol=1e-5)


def test_fftshift_roll_semantics():
    x = _rand_c((1, 1, 7, 10), seed=2)
    got = np.asarray(fftshift2(jnp.asarray(x)))
    want = torch.roll(torch.from_numpy(x), (7 // 2, 10 // 2), dims=(-2, -1)).numpy()
    np.testing.assert_array_equal(got, want)
    # ifftshift undoes fftshift for any (odd/even) size
    back = np.asarray(ifftshift2(fftshift2(jnp.asarray(x))))
    np.testing.assert_array_equal(back, x)


def test_rss_complex_is_real_l2_over_coils():
    x = _rand_c((2, 4, 8, 8), seed=3)
    got = np.asarray(rss(jnp.asarray(x)))
    want = torch.linalg.vector_norm(
        torch.from_numpy(x), ord=2, dim=1, keepdim=True
    ).numpy()
    assert got.shape == (2, 1, 8, 8)
    assert not np.iscomplexobj(got)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_rss_real():
    x = np.random.default_rng(4).standard_normal((2, 4, 8, 8)).astype(np.float32)
    got = np.asarray(rss(jnp.asarray(x)))
    want = np.sqrt((x**2).sum(1, keepdims=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_center_crop_crop_and_pad():
    x = np.arange(2 * 1 * 6 * 8, dtype=np.float32).reshape(2, 1, 6, 8)
    # crop
    y = center_crop(x, (4, 4))
    assert y.shape == (2, 1, 4, 4)
    np.testing.assert_array_equal(y, x[:, :, 1:5, 2:6])
    # pad
    z = center_crop(x, (8, 10))
    assert z.shape == (2, 1, 8, 10)
    np.testing.assert_array_equal(z[:, :, 1:7, 1:9], x)
    assert z[:, :, 0].sum() == 0 and z[:, :, 7].sum() == 0
    # odd-delta: extra pixel trails (reference: floor on the leading side)
    w = center_crop(x, (5, 8))
    np.testing.assert_array_equal(w, x[:, :, 0:5, :])
    # jnp input path
    yj = center_crop(jnp.asarray(x), (4, 4))
    np.testing.assert_array_equal(np.asarray(yj), y)


def test_forced_matmul_honored_past_size_heuristic():
    """set_fft_impl('matmul') must be honored unconditionally: a silent
    fallback past the 2048 auto-heuristic would let a strict-parity or
    A/B run measure the XLA path and pass vacuously."""
    from spatialalignmentnetwork_tpu.ops import fft as F

    old = F._FFT_IMPL
    try:
        F.set_fft_impl("matmul")
        assert F.active_fft_impl(4096, 4096) == "matmul"
        F.set_fft_impl("xla")
        assert F.active_fft_impl(64, 64) == "xla"
    finally:
        F.set_fft_impl(old)
