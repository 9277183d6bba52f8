"""k-space <-> image-space primitives.

Conventions (matching the reference semantics, see
/root/reference/signal_utils.py:4-26):
  * fft2/ifft2 are orthonormal ("ortho") 2-D transforms over the trailing two
    axes of an [N, C, H, W] array, with NO fftshift: the DC component lives at
    array index (0, 0) ("corner-DC" layout). Undersampling masks follow the
    same layout (low frequencies at the borders of the W axis).
  * fftshift2/ifftshift2 are roll-based half-shifts used only for
    visualisation of masks.
  * rss is the root-sum-of-squares coil combination: an L2 norm over the coil
    axis (dim 1), keepdim, returning a real array even for complex input.

All functions are pure jnp and jit-safe; FFTs lower to the XLA FFT op.
"""

import jax.numpy as jnp


def fft2(x: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal 2-D FFT over the last two axes. x: [N, C, H, W] complex."""
    assert x.ndim == 4
    return jnp.fft.fft2(x, norm="ortho")


def ifft2(x: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal 2-D inverse FFT over the last two axes."""
    assert x.ndim == 4
    return jnp.fft.ifft2(x, norm="ortho")


def fftshift2(x: jnp.ndarray) -> jnp.ndarray:
    """Half-roll both spatial axes so corner-DC moves to the center."""
    assert x.ndim == 4
    return jnp.roll(x, (x.shape[-2] // 2, x.shape[-1] // 2), axis=(-2, -1))


def ifftshift2(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of fftshift2 (handles odd sizes)."""
    assert x.ndim == 4
    return jnp.roll(
        x, ((x.shape[-2] + 1) // 2, (x.shape[-1] + 1) // 2), axis=(-2, -1)
    )


def rss(x: jnp.ndarray) -> jnp.ndarray:
    """Root-sum-of-squares over the coil axis (dim 1), keepdim.

    Returns a real array: for complex input this is sqrt(sum |x_c|^2).
    """
    assert x.ndim == 4
    if jnp.iscomplexobj(x):
        mag2 = x.real**2 + x.imag**2
    else:
        mag2 = x**2
    return jnp.sqrt(jnp.sum(mag2, axis=1, keepdims=True))
