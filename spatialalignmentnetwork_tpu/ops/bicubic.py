"""Torch-exact bicubic resampling (Keys cubic, a=-0.75) as matmuls.

The reference upsamples its 9x9 B-spline control grids with
`torch.nn.functional.interpolate(mode='bicubic', align_corners=False)`
(reference augment.py:45-46), whose cubic convolution kernel uses
a=-0.75. `jax.image.resize(method='bicubic')` uses the Keys kernel with
a=-0.5, so the deformation-field smoothness spectrum of a jax-resized
control grid differs from the reference recipe's.

This module closes that delta TPU-first: because the resample is
separable and the grid positions are static, each axis is a constant
[n_out, n_in] weight matrix (4 cubic taps per row, border taps clamped
and accumulated exactly like torch's index guard), and the 2-D resize is
two matmuls — MXU work with zero gathers, exact to f32 rounding against
torch CPU (tests/test_torch_parity.py).
"""

import numpy as np
import jax.numpy as jnp
from jax import lax


def _cubic_kernel(x: np.ndarray, a: float) -> np.ndarray:
    """Keys cubic convolution kernel with free parameter `a`.

    Torch's upsample_bicubic2d evaluates exactly this with a=-0.75
    (cubic_convolution1/2 in its cpu/gpu kernels).
    """
    x = np.abs(x)
    return np.where(
        x <= 1.0,
        ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, a * (((x - 5.0) * x + 8.0) * x - 4.0), 0.0),
    )


def cubic_weight_matrix(n_in: int, n_out: int, a: float = -0.75) -> np.ndarray:
    """[n_out, n_in] resampling matrix for one axis, half-pixel convention.

    Row i holds the 4 cubic tap weights for output pixel i at source
    coordinate (i + 0.5) * n_in / n_out - 0.5 (align_corners=False).
    Out-of-range taps are clamped to the border pixel and their weights
    accumulate there — the same guard torch applies per access — so each
    row still sums to 1 exactly.
    """
    i = np.arange(n_out, dtype=np.float64)
    src = (i + 0.5) * (float(n_in) / float(n_out)) - 0.5
    i0 = np.floor(src).astype(np.int64)
    t = src - i0
    out = np.zeros((n_out, n_in), dtype=np.float64)
    rows = np.arange(n_out)
    for tap in (-1, 0, 1, 2):
        idx = np.clip(i0 + tap, 0, n_in - 1)
        np.add.at(out, (rows, idx), _cubic_kernel(t - tap, a))
    return out.astype(np.float32)


def bicubic_resize2d(x: jnp.ndarray, out_h: int, out_w: int,
                     a: float = -0.75) -> jnp.ndarray:
    """Bicubic-resize the trailing two axes of `x` to (out_h, out_w).

    Matches torch interpolate(mode='bicubic', align_corners=False,
    antialias=False) to f32 rounding. Contractions run at HIGHEST
    precision: the weights are the signal here (control grids are tiny),
    and the cost is negligible next to the training step.
    """
    h, w = x.shape[-2], x.shape[-1]
    wh = jnp.asarray(cubic_weight_matrix(h, out_h, a))
    ww = jnp.asarray(cubic_weight_matrix(w, out_w, a))
    # rows then cols: [..., h, w] -> [..., out_h, w] -> [..., out_h, out_w]
    y = jnp.einsum("oi,...iw->...ow", wh, x,
                   precision=lax.Precision.HIGHEST)
    return jnp.einsum("pj,...oj->...op", ww, y,
                      precision=lax.Precision.HIGHEST)
