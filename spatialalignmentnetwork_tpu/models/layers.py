"""Shared building blocks for the network zoo.

All conv modules operate in NHWC (the natural TPU/XLA layout); the public
model facades convert from the framework's NCHW array convention at their
boundaries. Compute dtype is configurable (bf16 on TPU for speed); parameters
stay fp32.
"""

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


def nchw_to_nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x):
    return jnp.transpose(x, (0, 3, 1, 2))


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm without affine params over an NHWC array.

    Normalizes each (sample, channel) plane by its spatial mean/variance
    (biased variance, matching torch InstanceNorm2d defaults).
    """
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def leaky_relu(x, negative_slope=0.2):
    return nn.leaky_relu(x, negative_slope=negative_slope)


class ConvBlock(nn.Module):
    """Two (conv3x3 no-bias -> InstanceNorm -> LeakyReLU(0.2)) stages.

    fastMRI UNet basic block (reference varnet.py:122-156).
    """

    out_chans: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            x = nn.Conv(
                self.out_chans, (3, 3), padding=1, use_bias=False, dtype=self.dtype
            )(x)
            x = instance_norm(x)
            x = leaky_relu(x, 0.2)
        return x


class TransposeConvBlock(nn.Module):
    """ConvTranspose 2x2 stride-2 (no bias) -> InstanceNorm -> LeakyReLU(0.2)
    (reference varnet.py:159-192)."""

    out_chans: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(
            self.out_chans, (2, 2), strides=(2, 2), use_bias=False, dtype=self.dtype
        )(x)
        x = instance_norm(x)
        x = leaky_relu(x, 0.2)
        return x


def avg_pool2(x):
    """2x2 stride-2 average pooling, NHWC."""
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def upsample_nearest2(x):
    """Nearest-neighbor 2x upsample, NHWC."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)
