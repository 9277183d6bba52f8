"""SSIM training loss.

Matches the reference recon loss (ssimloss.py:11-40): 7x7 uniform window,
k1=0.01, k2=0.03, data_range=1, unbiased covariance normalization
NP/(NP-1), VALID windows, loss = 1 - mean(S).

The five window sums + elementwise SSIM map fuse into one XLA pass (see
ops/window.py); this is the fused-window-kernel hot path of the recon loss.
"""

import os

import jax
import jax.numpy as jnp

from .window import window_sum2d


def ssim_map(X: jnp.ndarray, Y: jnp.ndarray, win_size: int = 7,
             k1: float = 0.01, k2: float = 0.03, data_range: float = 1.0):
    """Per-window SSIM map over VALID windows of [N, C, H, W] real arrays."""
    assert not jnp.iscomplexobj(X) and not jnp.iscomplexobj(Y)
    NP = win_size**2
    cov_norm = NP / (NP - 1)
    C1 = (k1 * data_range) ** 2
    C2 = (k2 * data_range) ** 2
    inv = 1.0 / NP
    ux = window_sum2d(X, win_size) * inv
    uy = window_sum2d(Y, win_size) * inv
    uxx = window_sum2d(X * X, win_size) * inv
    uyy = window_sum2d(Y * Y, win_size) * inv
    uxy = window_sum2d(X * Y, win_size) * inv
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    A1 = 2 * ux * uy + C1
    A2 = 2 * vxy + C2
    B1 = ux**2 + uy**2 + C1
    B2 = vx + vy + C2
    return (A1 * A2) / (B1 * B2)


def ssimloss(X: jnp.ndarray, Y: jnp.ndarray, impl: str = None) -> jnp.ndarray:
    """1 - mean SSIM (reference ssimloss.py:11).

    impl: None/'auto' -> fused Pallas kernel on TPU backends, XLA-fused
    separable convs elsewhere; 'jnp'/'pallas' force a path.
    """
    impl = impl or os.environ.get("SAN_TPU_SSIM", "auto")
    use_pallas = impl == "pallas" or (
        impl == "auto" and jax.default_backend() in ("tpu", "axon")
    )
    if use_pallas:
        from .pallas.ssim import ssimloss_pallas

        return ssimloss_pallas(X, Y)
    return 1.0 - jnp.mean(ssim_map(X, Y))
