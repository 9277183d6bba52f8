"""Differentiable bilinear grid sampling + affine grid generation.

Torch-semantics sampling ops the spatial-alignment path is built on
(reference call sites: cross.py:23-38 STN warp, augment.py:36-61 synthetic
misalignment, eval.py:15-27 scaled deformation):

  * affine_grid(theta, size, align_corners=False): normalized sampling grid
    [N, H, W, 2] with grid[..., 0] = x (width axis), grid[..., 1] = y.
  * grid_sample(input, grid, padding_mode='zeros'|'reflection'|'border',
    align_corners=False): bilinear sampling; out-of-bounds reads are zero
    (zeros), edge-clamped (border) or edge-reflected (reflection).

Everything is pure jnp: gradients flow to BOTH the image and the grid via
autodiff (the registration training signal requires d(warp)/d(grid)).
Gathers lower to XLA gather ops; a fused Pallas TPU kernel for the
[N,C,320,320] hot path lives in ops/pallas/ (same API, same semantics).
"""

import os

import jax
import jax.numpy as jnp


def _base_coords_1d(n: int, dtype):
    """Normalized coords of pixel centers with align_corners=False:
    x_i = (2i + 1)/n - 1."""
    i = jnp.arange(n, dtype=dtype)
    return (2.0 * i + 1.0) / n - 1.0


def affine_grid(theta: jnp.ndarray, size, align_corners: bool = False) -> jnp.ndarray:
    """theta: [N, 2, 3]; size: (N, C, H, W) -> grid [N, H, W, 2]."""
    assert not align_corners, "only align_corners=False is supported"
    n, _, h, w = size
    dtype = theta.dtype
    xs = _base_coords_1d(w, dtype)  # [W]
    ys = _base_coords_1d(h, dtype)  # [H]
    base = jnp.stack(
        [
            jnp.broadcast_to(xs[None, :], (h, w)),
            jnp.broadcast_to(ys[:, None], (h, w)),
            jnp.ones((h, w), dtype),
        ],
        axis=-1,
    )  # [H, W, 3]
    # grid[n,h,w,k] = sum_j theta[n,k,j] * base[h,w,j]
    # precision=HIGHEST: TPU default matmul precision truncates f32 operands
    # to bf16, which would quantize every sampling grid (incl. identity) by
    # up to ~0.25 px at 320 resolution
    grid = jnp.einsum(
        "nkj,hwj->nhwk", theta, base, precision=jax.lax.Precision.HIGHEST
    )
    if n > 1 and grid.shape[0] == 1:
        grid = jnp.broadcast_to(grid, (n, h, w, 2))
    return grid


def identity_grid(size, dtype=jnp.float32) -> jnp.ndarray:
    """Identity affine grid for (N, C, H, W) (cross.py:24-26 equivalent)."""
    theta = jnp.array([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]], dtype=dtype)
    return affine_grid(theta, (1, *size[1:]))


def _reflect(x, size):
    """Reflect coordinate about pixel-edge boundaries [-0.5, size-0.5]
    (align_corners=False), then clamp into [0, size-1]."""
    low = -0.5
    span = float(size)
    t = jnp.abs(x - low)
    extra = jnp.mod(t, span)
    flips = jnp.floor(t / span)
    out = jnp.where(jnp.mod(flips, 2.0) == 0.0, extra + low, span - extra + low)
    return jnp.clip(out, 0.0, size - 1.0)


def grid_sample(
    input: jnp.ndarray,
    grid: jnp.ndarray,
    padding_mode: str = "zeros",
    align_corners: bool = False,
    impl: str = None,
) -> jnp.ndarray:
    """Bilinear sample `input` [N,C,H,W] at `grid` [N,Hg,Wg,2] -> [N,C,Hg,Wg].

    grid[..., 0] is x in [-1,1] over the W axis, grid[..., 1] is y over H.

    impl: None/'auto' (Pallas MXU kernel on TPU, XLA gather elsewhere),
    'jnp' (always gather), 'pallas' (always the kernel, interpreted off-TPU).
    """
    assert not align_corners, "only align_corners=False is supported"
    if jnp.iscomplexobj(input):
        # sample real/imag planes separately (torch grid_sample is also
        # real-only — the reference splits at the call site, augment.py:
        # 62-64); previously complex input fell through to the jnp path
        # and died on jnp.floor(complex)
        re = grid_sample(input.real, grid, padding_mode, align_corners, impl)
        im = grid_sample(input.imag, grid, padding_mode, align_corners, impl)
        return jax.lax.complex(re, im)
    if not jnp.issubdtype(input.dtype, jnp.floating):
        raise TypeError(
            f"grid_sample needs a float (or complex) image, got "
            f"{input.dtype}"
        )
    impl = impl or os.environ.get("SAN_TPU_GRID_SAMPLE", "auto")
    use_pallas = impl == "pallas" or (
        impl == "auto"
        and jax.default_backend() in ("tpu", "axon")
        and grid.shape[1] % 2 == 0
    )
    if use_pallas:
        from .pallas.grid_sample import grid_sample_pallas

        return grid_sample_pallas(input, grid, padding_mode)
    assert input.ndim == 4 and grid.ndim == 4 and grid.shape[-1] == 2
    n, c, h, w = input.shape
    dtype = input.dtype

    # coordinate math stays f32 regardless of the image dtype: a bf16
    # pixel coordinate near 320 has ulp = 1.0 — a full-pixel sampling
    # error (the same invariant affine_grid documents and the Pallas
    # kernel enforces). Only the final weighted gather uses the image
    # dtype.
    coord_dtype = (
        jnp.float32 if jnp.finfo(dtype).bits < 32 else dtype
    )
    x = grid[..., 0].astype(coord_dtype)
    y = grid[..., 1].astype(coord_dtype)
    # unnormalize (align_corners=False): pixel = ((coord + 1) * size - 1) / 2
    ix = ((x + 1.0) * w - 1.0) / 2.0
    iy = ((y + 1.0) * h - 1.0) / 2.0

    if padding_mode == "reflection":
        ix = _reflect(ix, w)
        iy = _reflect(iy, h)
    elif padding_mode == "border":
        ix = jnp.clip(ix, 0.0, w - 1.0)
        iy = jnp.clip(iy, 0.0, h - 1.0)
    elif padding_mode != "zeros":
        raise ValueError(f"unknown padding_mode: {padding_mode!r}")

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = ix - x0
    wy = iy - y0

    out = None
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        xc = x0 + dx
        yc = y0 + dy
        weight = (wx if dx else (1.0 - wx)) * (wy if dy else (1.0 - wy))
        if padding_mode == "zeros":
            valid = (xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
            weight = weight * valid.astype(coord_dtype)
        weight = weight.astype(dtype)  # output keeps the image dtype
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        flat_idx = yi * w + xi  # [N, Hg, Wg]
        # gather per batch element across all channels at once
        vals = jnp.take_along_axis(
            input.reshape(n, c, h * w),
            flat_idx.reshape(n, 1, -1),
            axis=2,
        ).reshape(n, c, *flat_idx.shape[1:])
        term = vals * weight[:, None, :, :]
        out = term if out is None else out + term
    return out


def warp(img: jnp.ndarray, grid: jnp.ndarray, padding_mode: str = "zeros") -> jnp.ndarray:
    """Warp an image (real or complex) by a sampling grid.

    Complex images warp real and imag parts with identical semantics
    (augment.py:62-64); they are packed as extra channels so one sampler
    pass covers both.
    """
    if jnp.iscomplexobj(img):
        c = img.shape[1]
        packed = jnp.concatenate([img.real, img.imag], axis=1)
        out = grid_sample(packed, grid, padding_mode)
        return out[:, :c] + 1j * out[:, c:]
    return grid_sample(img, grid, padding_mode)
