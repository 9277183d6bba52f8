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

# FFT implementation selection. XLA's TPU FFT lowering is slow for small
# batched transforms: measured on a v5e (B=64, 320x320 c64), native fft2 =
# 2.38 ms while the orthonormal DFT as four real [n, n] matmuls per axis =
# 0.97 ms at precision HIGH (bf16x3, 2.3e-5 max rel err) / 1.85 ms at
# HIGHEST (f32-exact, 5e-7) — docs/perf_ab_r02.jsonl. 'auto' resolves to
# the matmul path on TPU backends and native FFT elsewhere; 'xla' forces
# the native FFT (strict-parity runs).
_FFT_IMPL = os.environ.get("SAN_TPU_FFT", "auto")  # auto | xla | matmul
# matmul-DFT accumulation: 'high' (bf16x3 passes, default) | 'highest'
_FFT_MATMUL_PRECISION = os.environ.get("SAN_TPU_FFT_PRECISION", "high")


def set_fft_impl(impl: str = None, precision: str = None):
    """Select the FFT implementation and/or matmul-DFT accumulation
    precision; None leaves the respective setting unchanged."""
    global _FFT_IMPL, _FFT_MATMUL_PRECISION
    if impl is not None:
        assert impl in ("auto", "xla", "matmul")
        _FFT_IMPL = impl
    if precision is not None:
        assert precision in ("high", "highest")
        _FFT_MATMUL_PRECISION = precision


@functools.lru_cache(maxsize=32)
def _dft_matrix(n: int, inverse: bool):
    """Real/imag f32 NUMPY pair of the orthonormal (unitary) DFT matrix.

    Kept as two real host matrices: (a) complex host->device DMA is
    unimplemented on some relay backends (utils/transfer.py), (b) the
    transform is computed with real matmuls anyway (below), and (c) numpy
    constants are safe to cache across jit traces (device arrays created
    inside a trace would leak tracers)."""
    k = np.arange(n)
    ang = (2 if inverse else -2) * np.pi * np.outer(k, k) / n
    scale = 1.0 / np.sqrt(n)
    return (
        (np.cos(ang) * scale).astype(np.float32),
        (np.sin(ang) * scale).astype(np.float32),
    )


def _use_matmul(n_h, n_w):
    if _FFT_IMPL == "xla":
        return False
    if _FFT_IMPL == "matmul":
        # an explicitly forced impl is honored unconditionally (like
        # 'xla' above): silently falling back past a size heuristic
        # would let a strict-parity or A/B run measure the wrong path
        # and pass vacuously. The O(n^2) cost past ~2048 is the
        # requester's informed choice; only 'auto' applies the heuristic.
        return True
    # auto: matmul-DFT on TPU backends (measured 2.4x the native FFT),
    # native elsewhere (CPU FFT beats O(n^2) matmuls). 'axon' is the
    # relayed-TPU backend — same dispatch convention as the other auto
    # paths (ops/ssim.py:51, ops/grid_sample.py:95).
    try:
        import jax as _jax

        return (_jax.default_backend() in ("tpu", "axon")
                and max(n_h, n_w) <= 2048)
    except Exception:
        return False


def active_fft_impl(n_h, n_w):
    """The implementation fft2/ifft2 would dispatch for this plane size
    under the current settings: 'matmul' or 'xla'."""
    return "matmul" if _use_matmul(n_h, n_w) else "xla"


def _dft2(x, inverse):
    """2-D DFT as four real matmuls per axis (complex arithmetic expanded
    over a planar real/imag pair — the MXU has no complex type, and this
    also sidesteps relay backends' broken complex-einsum lowering)."""
    h, w = x.shape[-2], x.shape[-1]
    whr, whi = _dft_matrix(h, inverse)
    wwr, wwi = _dft_matrix(w, inverse)
    x = x.astype(jnp.complex64)
    a, b = jnp.real(x), jnp.imag(x)
    prec = (jax.lax.Precision.HIGHEST
            if _FFT_MATMUL_PRECISION == "highest"
            else jax.lax.Precision.HIGH)

    def mm_h(u, m):  # transform the H axis: sum_h m[k, h] u[..., h, w]
        return jnp.einsum("kh,nchw->nckw", m, u, precision=prec)

    ar = mm_h(a, whr) - mm_h(b, whi)
    ai = mm_h(a, whi) + mm_h(b, whr)

    def mm_w(u, m):  # W axis; DFT matrices are symmetric: right-multiply
        return jnp.einsum("nckw,wl->nckl", u, m, precision=prec)

    rr = mm_w(ar, wwr) - mm_w(ai, wwi)
    ri = mm_w(ar, wwi) + mm_w(ai, wwr)
    return jax.lax.complex(rr, ri)


def _dft2_planar(x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    """Planar-NHWC orthonormal 2-D DFT.

    x: REAL [N, H, W, 2C] with channels [re_0..re_{C-1}, im_0..im_{C-1}]
    (the planar VarNet carry layout). Same math as _dft2 but without the
    complex pack/unpack at the boundary: the four real matmuls per axis
    read and write the planar pair directly, so a planar caller never
    materializes complex intermediates.
    """
    n, h, w, k2 = x.shape
    c = k2 // 2
    a, b = x[..., :c], x[..., c:]
    whr, whi = _dft_matrix(h, inverse)
    wwr, wwi = _dft_matrix(w, inverse)
    prec = (jax.lax.Precision.HIGHEST
            if _FFT_MATMUL_PRECISION == "highest"
            else jax.lax.Precision.HIGH)

    def mm_h(u, m):  # H axis: sum_h m[k, h] u[n, h, w, c]
        return jnp.einsum("kh,nhwc->nkwc", m, u, precision=prec)

    ar = mm_h(a, whr) - mm_h(b, whi)
    ai = mm_h(a, whi) + mm_h(b, whr)

    def mm_w(u, m):  # W axis (DFT matrices are symmetric)
        return jnp.einsum("nkwc,wl->nklc", u, m, precision=prec)

    rr = mm_w(ar, wwr) - mm_w(ai, wwi)
    ri = mm_w(ar, wwi) + mm_w(ai, wwr)
    return jnp.concatenate([rr, ri], axis=-1)


def fft2_planar(x: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal 2-D FFT of a planar-NHWC pair [N, H, W, 2C] (H, W are
    axes 1 and 2). Falls back through complex jnp.fft off-TPU."""
    assert x.ndim == 4 and not jnp.iscomplexobj(x)
    if _use_matmul(x.shape[1], x.shape[2]):
        return _dft2_planar(x, inverse=False)
    return _planar_via_complex(x, jnp.fft.fft2)


def ifft2_planar(x: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal 2-D inverse FFT of a planar-NHWC pair [N, H, W, 2C]."""
    assert x.ndim == 4 and not jnp.iscomplexobj(x)
    if _use_matmul(x.shape[1], x.shape[2]):
        return _dft2_planar(x, inverse=True)
    return _planar_via_complex(x, jnp.fft.ifft2)


def _planar_via_complex(x, fft_fn):
    c = x.shape[-1] // 2
    if x.dtype not in (jnp.float32, jnp.float64):
        # sub-f32 planar storage (SAN_TPU_KSPACE=bf16 carries): the native
        # FFT path has no bf16 complex type — upcast at the boundary
        x = x.astype(jnp.float32)
    z = jax.lax.complex(x[..., :c], x[..., c:])
    z = fft_fn(z, axes=(1, 2), norm="ortho")
    return jnp.concatenate([z.real, z.imag], axis=-1)


def rss_planar(x: jnp.ndarray) -> jnp.ndarray:
    """Root-sum-of-squares over coils of a planar-NHWC pair [N, H, W, 2C]
    -> [N, H, W, 1], with the same zero-gradient-at-zero guard as rss."""
    assert x.ndim == 4
    s = jnp.sum(x * x, axis=-1, keepdims=True)
    nonzero = s > 0
    return jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, s, 1.0)), 0.0)


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
