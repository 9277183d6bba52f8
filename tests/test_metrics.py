"""Eval metric tests: internal consistency + torch cross-checks."""

import numpy as np
import torch

from spatialalignmentnetwork_tpu.utils import metrics as M


def _pair(seed=0, shape=(4, 1, 64, 64)):
    rng = np.random.default_rng(seed)
    gt = rng.random(shape).astype(np.float32)
    pred = np.clip(gt + 0.05 * rng.standard_normal(shape), 0, 1).astype(np.float32)
    return gt, pred


def test_mse_mae_nmse():
    gt, pred = _pair()
    assert abs(M.mse(gt, pred) - np.mean((gt - pred) ** 2)) < 1e-9
    assert abs(M.mae(gt, pred) - np.mean(np.abs(gt - pred))) < 1e-9
    want = np.linalg.norm(gt - pred) ** 2 / np.linalg.norm(gt) ** 2
    assert abs(M.nmse(gt, pred) - want) < 1e-9


def test_psnr_formula():
    gt, pred = _pair(1)
    want = 10 * np.log10(1.0 / np.mean((gt - pred) ** 2, dtype=np.float64))
    assert abs(M.psnr(gt, pred) - want) < 1e-9
    assert M.psnr(gt, gt + 0.1) < M.psnr(gt, gt + 0.01)


def test_ssim_bounds_and_monotonicity():
    gt, pred = _pair(2)
    s_close = M.ssim(gt, pred)
    s_self = M.ssim(gt, gt)
    gt2, _ = _pair(3)
    s_far = M.ssim(gt, np.ascontiguousarray(gt2[::-1]))
    assert abs(s_self - 1.0) < 1e-9
    assert s_far < s_close < s_self


def test_ssim_matches_window_formula():
    """Cross-check the host ssim against the VALID-window jnp SSIM map used
    for training (they share the formula; uniform_filter+crop == valid)."""
    import jax.numpy as jnp
    from spatialalignmentnetwork_tpu.ops.ssim import ssim_map

    gt, pred = _pair(4, shape=(2, 1, 40, 40))
    want = float(jnp.mean(ssim_map(jnp.asarray(gt), jnp.asarray(pred))))
    got = M.ssim(gt, pred)
    assert abs(got - want) < 1e-5


def test_mi_positive_for_correlated():
    gt, pred = _pair(5)
    rng = np.random.default_rng(6)
    shuf = rng.permutation(pred.ravel()).reshape(pred.shape)
    assert M.mi(gt, pred) > M.mi(gt, shuf)


def test_dice():
    a = np.zeros((1, 1, 8, 8))
    b = np.zeros((1, 1, 8, 8))
    a[0, 0, :4] = 1
    b[0, 0, 2:6] = 1
    got = M.dice(a, b)
    assert abs(got - 2 * 16 / (32 + 32)) < 1e-9


def test_jax_metrics_match_numpy():
    import jax.numpy as jnp
    from spatialalignmentnetwork_tpu.utils import metrics_jax as J

    gt, pred = _pair(8)
    g, p = jnp.asarray(gt), jnp.asarray(pred)
    assert abs(float(J.mse(g, p)) - M.mse(gt, pred)) < 1e-7
    assert abs(float(J.mae(g, p)) - M.mae(gt, pred)) < 1e-7
    assert abs(float(J.nmse(g, p)) - M.nmse(gt, pred)) < 1e-6
    assert abs(float(J.psnr(g, p)) - M.psnr(gt, pred)) < 1e-3
    assert abs(float(J.ssim(g, p)) - M.ssim(gt, pred)) < 1e-5
    assert abs(float(J.mi(g, p)) - M.mi(gt, pred)) < 1e-4


def test_accepts_torch_and_jax_arrays():
    gt, pred = _pair(7)
    assert abs(M.psnr(torch.from_numpy(gt), pred) - M.psnr(gt, pred)) < 1e-9


def test_dice_both_empty_is_one():
    """Two empty masks overlap perfectly by convention — the raw 0/0 must
    not raise (per-label sweeps hit background-only slices routinely)."""
    gt = np.zeros((1, 1, 4, 4), np.int32)
    pred = np.zeros((1, 1, 4, 4), np.int32)
    assert M.dice(gt, pred, label=3) == 1.0
    assert M.dice(gt, pred) == 1.0  # both all-background
