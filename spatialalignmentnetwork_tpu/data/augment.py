"""Synthetic misalignment augmentation (device-side, jax RNG).

Re-implementation of the reference augmentation (augment.py:7-66): per-sample
random rigid transforms (rotation U(+-0.005*2pi), translation U(+-0.05),
same shift on both axes) composed with a 9x9 random B-spline control grid
(U(+-1/50)) bicubically upsampled to the image size; images are warped with
bilinear sampling under reflection padding. Complex images warp real/imag
separately.

All grid generation runs on device from explicit PRNG keys — no host RNG in
the hot loop. The four batch policies (None/Rigid/BSpline/PBSpline —
PBSpline deforms all modalities with ONE shared grid, train.py:35-59) are
provided as `augment_batch`.

Cubic upsampling of the control grid is torch-exact (Keys a=-0.75,
half-pixel, replicate borders) via ops/bicubic.py — constant per-axis
weight matrices contracted on the MXU, parity-tested against
torch.nn.functional.interpolate(mode='bicubic').
"""

import jax
import jax.numpy as jnp

from ..ops.bicubic import bicubic_resize2d
from ..ops.grid_sample import affine_grid, warp as _warp_pad


def rigid_grid(key, batch_shape):
    """Random per-sample rigid (rotation+translation) sampling grids.

    batch_shape: (N, C, H, W). Returns grid [N, H, W, 2].
    """
    n = batch_shape[0]
    k_r, k_t = jax.random.split(key)
    rotation = 2 * jnp.pi * 0.005
    translation = 0.05
    r = jax.random.uniform(k_r, (n,), minval=-rotation, maxval=rotation)
    t = jax.random.uniform(k_t, (n,), minval=-translation, maxval=translation)
    cos, sin = jnp.cos(r), jnp.sin(r)
    # M = T @ R with the same shift on both axes (reference augment.py:19-31)
    theta = jnp.stack(
        [
            jnp.stack([cos, -sin, t], axis=-1),
            jnp.stack([sin, cos, t], axis=-1),
        ],
        axis=1,
    )  # [N, 2, 3]
    return affine_grid(theta, batch_shape)


def bspline_grid(key, batch_shape):
    """Random smooth dense offsets from a 9x9 control grid (augment.py:40-48).

    Returns offsets [N, H, W, 2] (to be ADDED to a base grid).
    """
    n, _, h, w = batch_shape
    scale = 50
    ctrl = (jax.random.uniform(key, (n, 2, 9, 9)) - 0.5) * 2 / scale
    dense = bicubic_resize2d(ctrl, h, w)
    return jnp.transpose(dense, (0, 2, 3, 1))


def augment(img, key=None, rigid=True, bspline=True, grid=None):
    """Warp `img` by a random (rigid [+ bspline]) grid, reflection padding.

    Returns (warped, grid). Pass `grid` to reuse a precomputed deformation
    (rigid and bspline must then be False), as PBSpline does.
    """
    if grid is None:
        assert rigid and key is not None
        k1, k2 = jax.random.split(key)
        grid = rigid_grid(k1, img.shape)
        if bspline:
            grid = grid + bspline_grid(k2, img.shape)
    else:
        assert not rigid and not bspline
    out = _warp_pad(img, grid, padding_mode="reflection")
    return out, grid


def augment_batch(policy, batch, key):
    """Apply a named augmentation policy to a list of modality arrays.

    policy: 'None' | 'Rigid' | 'BSpline' | 'PBSpline'
    (reference train.py:35-59). PBSpline = one shared grid for all
    modalities (a patient-level deformation).
    """
    if policy == "None":
        return batch
    if policy == "Rigid":
        keys = jax.random.split(key, len(batch))
        return [
            augment(x, k, rigid=True, bspline=False)[0]
            for x, k in zip(batch, keys)
        ]
    if policy == "BSpline":
        keys = jax.random.split(key, len(batch))
        return [
            augment(x, k, rigid=True, bspline=True)[0]
            for x, k in zip(batch, keys)
        ]
    if policy == "PBSpline":
        out = []
        grid = None
        for x in batch:
            if grid is None:
                y, grid = augment(x, key, rigid=True, bspline=True)
            else:
                y, _ = augment(x, rigid=False, bspline=False, grid=grid)
            out.append(y)
        return out
    raise ValueError(f"unknown augmentation policy: {policy!r}")


def scaled_deformation(key, img, factor):
    """Eval-time scaled synthetic misalignment (reference eval.py:15-27):
    draw a rigid+bspline grid, scale its offset from identity by `factor`,
    warp img with it."""
    _, grid = augment(img, key, rigid=True, bspline=True)
    identity = affine_grid(
        jnp.broadcast_to(
            jnp.array([[[1.0, 0, 0], [0, 1.0, 0]]], jnp.float32),
            (img.shape[0], 2, 3),
        ),
        img.shape,
    )
    grid = identity + (grid - identity) * factor
    out, _ = augment(img, rigid=False, bspline=False, grid=grid)
    return out
