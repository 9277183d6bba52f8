"""Shared windowed-sum helpers for the window losses (SSIM/LNCC).

Window sums are expressed as separable ones-kernel convolutions: XLA lowers
these to cheap windowed reductions on TPU and fuses them with the
surrounding elementwise math; the separable split makes the cost O(win)
instead of O(win^2) per pixel.
"""

import jax.numpy as jnp
from jax import lax

# TPU conv/dot default precision truncates f32 operands to bf16. For the
# LOSS formulations built on these helpers that is a real parity hazard,
# found on-chip (2026-08-19): the scalar SSIM loss still matched the fused
# Pallas kernel to <1e-4 (averaging cancels the rounding), but its autodiff
# GRADIENTS were off by 8e-3 pointwise — training-signal noise the torch
# reference (f32 cuDNN convs) does not have. Pin HIGHEST: these ops run on
# 1-channel loss inputs, so the extra passes are nowhere near a hot path,
# and the jnp formulations stay valid parity references for the kernels.
_PRECISION = lax.Precision.HIGHEST


def window_sum2d(x: jnp.ndarray, win: int, padding: str = "VALID") -> jnp.ndarray:
    """Sum over win x win spatial windows of an [N, C, H, W] array.

    padding 'VALID' (output H-win+1) or 'SAME' (zero-padded, matching a
    torch conv2d with padding=win//2 when win is odd).

    Implemented as two separable rank-1 depthwise convolutions (ones
    kernels) rather than lax.reduce_window: the conv path has complete
    autodiff support (reduce_window's generic linearization rule fails for
    non-differentiated traced operands in jit-of-grad as of jax 0.9) and XLA
    fuses/optimizes it the same way on TPU.
    """
    c = x.shape[1]
    if padding == "VALID":
        pad_h = pad_w = ((0, 0),)
    elif padding == "SAME":
        pad_h = pad_w = ((win // 2, win // 2),)
    else:
        raise ValueError(padding)
    ones_h = jnp.ones((c, 1, win, 1), x.dtype)
    ones_w = jnp.ones((c, 1, 1, win), x.dtype)
    x = lax.conv_general_dilated(
        x, ones_h, (1, 1), (pad_h[0], (0, 0)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c,
        precision=_PRECISION,
    )
    return lax.conv_general_dilated(
        x, ones_w, (1, 1), ((0, 0), pad_w[0]),
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c,
        precision=_PRECISION,
    )


def avg_pool2d_nchw(x: jnp.ndarray, k: int = 2) -> jnp.ndarray:
    """k x k stride-k average pooling over [N, C, H, W]."""
    c = x.shape[1]
    ones = jnp.ones((c, 1, k, k), x.dtype)
    s = lax.conv_general_dilated(
        x, ones, (k, k), ((0, 0), (0, 0)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c,
        precision=_PRECISION,
    )
    return s / (k * k)


def conv2d_same_nchw(x: jnp.ndarray, kernel2d: jnp.ndarray) -> jnp.ndarray:
    """Depthwise-style 2-D convolution of [N, C, H, W] with one [kh, kw]
    kernel shared across channels, zero 'same' padding (odd kernels)."""
    kh, kw = kernel2d.shape
    c = x.shape[1]
    k = jnp.broadcast_to(kernel2d[None, None], (c, 1, kh, kw))
    return lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
        precision=_PRECISION,
    )
