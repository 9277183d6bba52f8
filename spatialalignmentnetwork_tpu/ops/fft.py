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

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

# FFT implementation selection. XLA's TPU FFT lowering can be slow for
# small batched transforms; an orthonormal DFT is a pair of [n, n] complex
# matmuls that ride the MXU at full throughput (n=320 => ~0.26 GFLOP per
# plane-axis, trivially fused with neighbours). The matmul path is opt-in
# (SAN_TPU_FFT=matmul or set_fft_impl) pending A/B measurement on target
# hardware; 'auto' currently resolves to the native XLA FFT.
_FFT_IMPL = os.environ.get("SAN_TPU_FFT", "auto")  # auto | xla | matmul


def set_fft_impl(impl: str):
    global _FFT_IMPL
    assert impl in ("auto", "xla", "matmul")
    _FFT_IMPL = impl


@functools.lru_cache(maxsize=32)
def _dft_matrix(n: int, inverse: bool):
    """Orthonormal (unitary) DFT matrix, complex64. Symmetric.

    Built on device from a planar real/imag f32 pair: complex host->device
    DMA is unimplemented on some relay backends (utils/transfer.py), and
    the constant is cached per size anyway.
    """
    k = np.arange(n)
    ang = (2 if inverse else -2) * np.pi * np.outer(k, k) / n
    scale = 1.0 / np.sqrt(n)
    re = jnp.asarray((np.cos(ang) * scale).astype(np.float32))
    im = jnp.asarray((np.sin(ang) * scale).astype(np.float32))
    return jax.lax.complex(re, im)


def _use_matmul(n_h, n_w):
    if _FFT_IMPL == "matmul":
        return max(n_h, n_w) <= 2048
    return False  # 'auto' and 'xla': native FFT


def _dft2(x, inverse):
    h, w = x.shape[-2], x.shape[-1]
    wh = _dft_matrix(h, inverse)
    ww = _dft_matrix(w, inverse)
    x = x.astype(jnp.complex64)
    # transform H axis: sum_h Wh[k, h] x[..., h, w]; DFT matrices are
    # symmetric so the W-axis transform is a plain right-multiply.
    # precision=HIGHEST keeps the unitary transform at true f32 (TPU default
    # matmul precision truncates operands to bf16).
    hi = jax.lax.Precision.HIGHEST
    x = jnp.einsum("kh,nchw->nckw", wh, x, precision=hi)
    return jnp.einsum("nckw,wl->nckl", x, ww, precision=hi)


def fft2(x: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal 2-D FFT over the last two axes. x: [N, C, H, W] complex."""
    assert x.ndim == 4
    if _use_matmul(x.shape[-2], x.shape[-1]):
        return _dft2(x, inverse=False)
    return jnp.fft.fft2(x, norm="ortho")


def ifft2(x: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal 2-D inverse FFT over the last two axes."""
    assert x.ndim == 4
    if _use_matmul(x.shape[-2], x.shape[-1]):
        return _dft2(x, inverse=True)
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
    The gradient at an exactly-zero input is defined as 0 (sqrt's infinite
    slope at 0 would otherwise poison training the moment any plane is
    all-zero — e.g. a dummy 'None' modality or an empty ACS region).
    """
    assert x.ndim == 4
    if jnp.iscomplexobj(x):
        mag2 = x.real**2 + x.imag**2
    else:
        mag2 = x**2
    s = jnp.sum(mag2, axis=1, keepdims=True)
    nonzero = s > 0
    return jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, s, 1.0)), 0.0)
