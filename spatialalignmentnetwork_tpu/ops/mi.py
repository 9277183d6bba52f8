"""Differentiable mutual-information registration loss (Parzen windows).

Matches the reference library loss (miloss.py): marginal densities estimated
with Gaussian kernels at 64 bin centers (sigma=1/64 of the intensity range),
joint density as the outer product of per-pixel kernel responses; the batch
dimension is averaged (vmapped here instead of a python loop).
"""

import math
import os

import jax
import jax.numpy as jnp

from .window import conv2d_same_nchw, avg_pool2d_nchw


def gaussian_kernel_1d(sigma: float) -> jnp.ndarray:
    kernel_size = int(2 * math.ceil(sigma * 2) + 1)
    x = jnp.linspace(-(kernel_size - 1) // 2, (kernel_size - 1) // 2, kernel_size)
    k = (1.0 / (sigma * math.sqrt(2 * math.pi))) * jnp.exp(-(x**2) / (2 * sigma**2))
    return k / jnp.sum(k)


def gaussian_kernel_2d(sigma_hw) -> jnp.ndarray:
    k = jnp.outer(gaussian_kernel_1d(sigma_hw[0]), gaussian_kernel_1d(sigma_hw[1]))
    return k / jnp.sum(k)


def gaussian_smooth(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Gaussian blur of [N, C, H, W] with a (2*ceil(2 sigma)+1)^2 kernel."""
    return conv2d_same_nchw(img, gaussian_kernel_2d((sigma, sigma)))


def _marginal(values, bins, sigma):
    """values [M], bins [B] -> (entropy, parzen responses [B, M])."""
    normalizer = math.sqrt(2.0 * math.pi) * sigma
    p = jnp.exp(-((values[None, :] - bins[:, None]) ** 2) / (2 * sigma**2)) / normalizer
    p_n = p.mean(axis=1)
    p_n = p_n / (jnp.sum(p_n) + 1e-10)
    ent = -jnp.sum(p_n * jnp.log(p_n + 1e-10))
    return ent, p


def _mi_single(I, J, bins, sigma):
    ent_I, p_I = _marginal(I.reshape(-1), bins, sigma)
    ent_J, p_J = _marginal(J.reshape(-1), bins, sigma)
    normalizer_2d = 2.0 * math.pi * sigma**2
    # [bins, P] @ [P, bins] over ~1e5 pixels: pin f32 precision — the TPU
    # default truncates to bf16, which the on-chip kernel-parity run showed
    # corrupts the (pointwise) autodiff gradients of these loss
    # formulations (see ops/window.py note, 2026-08-19)
    p_joint = jnp.dot(
        p_I, p_J.T, precision=jax.lax.Precision.HIGHEST
    ) / normalizer_2d
    p_joint = p_joint / (jnp.sum(p_joint) + 1e-10)
    ent_joint = -jnp.sum(p_joint * jnp.log(p_joint + 1e-10))
    return -(ent_I + ent_J - ent_joint)


def mi_loss(I, J, bins: int = 64, sigma: float = 1.0 / 64,
            minVal: float = 0.0, maxVal: float = 1.0, impl: str = None):
    """Negative MI between per-sample image pairs, averaged over the batch."""
    impl = impl or os.environ.get("SAN_TPU_MI", "auto")
    if impl == "pallas" or (
        impl == "auto" and jax.default_backend() in ("tpu", "axon")
    ):
        from .pallas.mi import mi_loss_pallas

        return mi_loss_pallas(I, J, bins, sigma, minVal, maxVal)
    centers = jnp.linspace(minVal, maxVal, bins)
    per = jax.vmap(lambda a, b: _mi_single(a, b, centers, sigma))(I, J)
    return jnp.mean(per)


def ms_mi_loss(I, J, bins: int = 64, sigma: float = 1.0 / 64, ms: int = 3,
               smooth: float = 3.0, minVal: float = 0.0, maxVal: float = 1.0):
    loss = mi_loss(I, J, bins=bins, sigma=sigma, minVal=minVal, maxVal=maxVal)
    for _ in range(ms - 1):
        I = avg_pool2d_nchw(gaussian_smooth(I, smooth))
        J = avg_pool2d_nchw(gaussian_smooth(J, smooth))
        loss = loss + mi_loss(I, J, bins=bins, sigma=sigma, minVal=minVal, maxVal=maxVal)
    return loss / ms
