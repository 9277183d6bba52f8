"""Parity tests for SSIM/LNCC/MI losses vs torch implementations of the same
published formulas, and smoothing helpers."""

import math

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from spatialalignmentnetwork_tpu.ops.ssim import ssimloss
from spatialalignmentnetwork_tpu.ops.lncc import lncc_loss, ms_lncc_loss
from spatialalignmentnetwork_tpu.ops.mi import mi_loss, gaussian_smooth, gaussian_kernel_1d


def _rand(shape, seed=0):
    return np.random.default_rng(seed).random(shape).astype(np.float32)


def _torch_ssimloss(X, Y):
    """Reference SSIM loss formula (ssimloss.py:11-40) in torch."""
    win_size, k1, k2, data_range = 7, 0.01, 0.03, 1
    w = torch.ones(1, 1, win_size, win_size) / win_size**2
    NP = win_size**2
    cov_norm = NP / (NP - 1)
    C1, C2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    ux, uy = F.conv2d(X, w), F.conv2d(Y, w)
    uxx, uyy, uxy = F.conv2d(X * X, w), F.conv2d(Y * Y, w), F.conv2d(X * Y, w)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
        (ux**2 + uy**2 + C1) * (vx + vy + C2)
    )
    return 1 - S.mean()


def test_ssimloss_matches_torch_formula():
    X, Y = _rand((2, 1, 40, 40), 0), _rand((2, 1, 40, 40), 1)
    got = float(ssimloss(jnp.asarray(X), jnp.asarray(Y)))
    want = float(_torch_ssimloss(torch.from_numpy(X), torch.from_numpy(Y)))
    assert abs(got - want) < 1e-5


def test_ssimloss_zero_for_identical():
    X = _rand((1, 1, 32, 32), 2)
    assert abs(float(ssimloss(jnp.asarray(X), jnp.asarray(X)))) < 1e-5


def test_ssimloss_differentiable():
    X, Y = jnp.asarray(_rand((1, 1, 32, 32), 3)), jnp.asarray(_rand((1, 1, 32, 32), 4))
    g = jax.grad(lambda a: ssimloss(a, Y))(X)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0


def _torch_lncc(I, J, win=9):
    """Reference LNCC formula (lnccloss.py:7-56) in torch."""
    filt = torch.ones(1, 1, win, win)
    pad = win // 2
    conv = lambda x: F.conv2d(x, filt, padding=pad)
    I_sum, J_sum = conv(I), conv(J)
    I2_sum, J2_sum, IJ_sum = conv(I * I), conv(J * J), conv(I * J)
    ws = win * win
    u_I, u_J = I_sum / ws, J_sum / ws
    cross = IJ_sum - u_J * I_sum - u_I * J_sum + u_I * u_J * ws
    I_var = I2_sum - 2 * u_I * I_sum + u_I * u_I * ws
    J_var = J2_sum - 2 * u_J * J_sum + u_J * u_J * ws
    cc = cross * cross / (I_var * J_var + 1e-5)
    return -cc.mean()


def test_lncc_matches_torch_formula():
    I, J = _rand((2, 1, 33, 37), 5), _rand((2, 1, 33, 37), 6)
    got = float(lncc_loss(jnp.asarray(I), jnp.asarray(J)))
    want = float(_torch_lncc(torch.from_numpy(I), torch.from_numpy(J)))
    assert abs(got - want) < 2e-4


def test_ms_lncc_runs_and_orders():
    I = _rand((1, 1, 64, 64), 7)
    J_close = I + 0.01 * _rand((1, 1, 64, 64), 8)
    J_far = _rand((1, 1, 64, 64), 9)
    close = float(ms_lncc_loss(jnp.asarray(I), jnp.asarray(J_close)))
    far = float(ms_lncc_loss(jnp.asarray(I), jnp.asarray(J_far)))
    assert close < far  # more negative = more correlated


def test_gaussian_smooth_matches_torch():
    sigma = 1.5
    x = _rand((2, 1, 21, 21), 10)
    got = np.asarray(gaussian_smooth(jnp.asarray(x), sigma))
    # torch reference (miloss.py:6-24)
    ks = int(2 * math.ceil(sigma * 2) + 1)
    t = torch.linspace(-(ks - 1) // 2, (ks - 1) // 2, ks)
    k1 = 1.0 / (sigma * math.sqrt(2 * math.pi)) * torch.exp(-(t**2) / (2 * sigma**2))
    k1 = k1 / k1.sum()
    k2 = torch.tensordot(k1, k1, 0)
    k2 = (k2 / k2.sum())[None, None]
    want = F.conv2d(torch.from_numpy(x), k2, padding=ks // 2).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_mi_loss_recovers_histogram_mi():
    """Differentiable MI tracks histogram MI on correlated data
    (pattern: miloss.py:87-123)."""
    rng = np.random.default_rng(11)
    noise = 0.1
    x = (rng.random(128 * 128) * (1 - noise)).astype(np.float32)
    y = (x + rng.random(128 * 128).astype(np.float32) * noise).astype(np.float32)
    x_shuf = rng.permutation(x)

    I = jnp.asarray(x.reshape(1, 1, 128, 128))
    J = jnp.asarray(y.reshape(1, 1, 128, 128))
    J_shuf = jnp.asarray(x_shuf.reshape(1, 1, 128, 128))
    mi_corr = -float(mi_loss(I, J))
    mi_rand = -float(mi_loss(I, J_shuf))
    assert mi_corr > mi_rand + 0.5

    from spatialalignmentnetwork_tpu.utils.metrics import mi as mi_hist

    h = mi_hist(np.asarray(I), np.asarray(J))
    # Parzen MI with sigma=1/64 approximates 64-bin histogram MI
    assert abs(mi_corr - h) / h < 0.35


def test_mi_loss_differentiable():
    I = jnp.asarray(_rand((2, 1, 32, 32), 12))
    J = jnp.asarray(_rand((2, 1, 32, 32), 13))
    g = jax.grad(lambda a: mi_loss(a, J))(I)
    assert np.isfinite(np.asarray(g)).all()
