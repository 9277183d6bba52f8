"""Spatial alignment network (STN): dense deformable 2-D registration.

Re-implementation of the reference net_T (cross.py:9-38): a LibUNet over the
concatenated (moving, fixed) magnitude images predicting a dense 2-channel
displacement field, zero-initialized at the head so the transform starts as
the identity; warping is bilinear grid sampling (align_corners=False, zero
padding).
"""

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from .layers import nchw_to_nhwc
from .unet_lib import LibUNet
from ..ops.grid_sample import grid_sample, identity_grid


class SpatialTransformer(nn.Module):
    """Predict (offset, grid) warping `moving` onto `fixed`.

    Inputs are real NCHW [N, coils, H, W]; offset/grid are [N, H, W, 2] with
    channel 0 = x (width) displacement in normalized [-1, 1] coords.
    """

    channels: int = 1
    feat: int = 32
    layers: Sequence[int] = (32, 64, 64, 64, 64)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, moving, fixed, train: bool = True):
        assert moving.ndim == 4 and not jnp.iscomplexobj(moving)
        x = jnp.concatenate([moving, fixed], axis=1)
        x = nchw_to_nhwc(x)
        x = LibUNet(self.feat, self.layers, dtype=self.dtype)(x, train)
        x = nn.leaky_relu(x, negative_slope=0.01)
        # zero-init head => identity transform at init (cross.py:20-21)
        offset = nn.Conv(
            2, (3, 3), padding=1,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )(x)  # [N, H, W, 2] — NHWC conv output is already "permuted"
        # grid coordinates stay f32 even under a bf16 policy: a bf16 grid
        # quantizes sample positions to ~8 mantissa bits (~0.6 px at 320),
        # degrading registration. The reference promotes too (cross.py:25
        # affine_grid is f32; grid.float() in warp).
        offset = offset.astype(jnp.float32)
        grid = identity_grid(moving.shape, dtype=jnp.float32) + offset
        return offset, grid


def warp(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear warp (cross.py:32-38): zero padding, align_corners=False."""
    return grid_sample(img, grid, padding_mode="zeros")


def gradient_loss(offset: jnp.ndarray) -> jnp.ndarray:
    """Smoothness penalty: mean squared forward differences of the
    displacement field (reference model.py:21-28). offset: [N, H, W, 2]."""
    assert offset.shape[-1] == 2, "not a 2-D grid"
    dx = jnp.abs(offset[:, :, 1:, :] - offset[:, :, :-1, :])
    dy = jnp.abs(offset[:, 1:, :, :] - offset[:, :-1, :, :])
    return (jnp.mean(dx * dx) + jnp.mean(dy * dy)) / 2.0
