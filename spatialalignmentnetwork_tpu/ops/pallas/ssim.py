"""Fused Pallas TPU kernel for the SSIM loss forward pass.

One program per (sample, channel) plane: both images live in VMEM and the
five 7x7 window sums + the SSIM map + the reduction happen in a single
fused pass — no window-sum intermediates ever touch HBM (the XLA fallback
materializes fused chains well, but still streams five separable conv
results; here the arithmetic intensity stays on-chip end to end).

Window sums use separable static-shift adds (O(win) adds per axis on the
VPU). Output is one partial sum per plane; the host-side wrapper reduces to
the scalar loss 1 - mean(S). Backward via custom VJP over the closed-form
jnp formulation (ops/ssim.py) — identical math, XLA-derived gradient.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _window_sum_valid(a, win):
    h, w = a.shape
    s = a[:, 0 : w - win + 1]
    for dj in range(1, win):
        s = s + a[:, dj : w - win + 1 + dj]
    t = s[0 : h - win + 1, :]
    for di in range(1, win):
        t = t + s[di : h - win + 1 + di, :]
    return t


def _ssim_sum_kernel(x_ref, y_ref, out_ref, *, win, k1, k2, data_range):
    x = x_ref[0, 0].astype(jnp.float32)
    y = y_ref[0, 0].astype(jnp.float32)
    NP = win * win
    inv = 1.0 / NP
    cov_norm = NP / (NP - 1)
    C1 = (k1 * data_range) ** 2
    C2 = (k2 * data_range) ** 2

    ux = _window_sum_valid(x, win) * inv
    uy = _window_sum_valid(y, win) * inv
    uxx = _window_sum_valid(x * x, win) * inv
    uyy = _window_sum_valid(y * y, win) * inv
    uxy = _window_sum_valid(x * y, win) * inv

    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    A1 = 2 * ux * uy + C1
    A2 = 2 * vxy + C2
    B1 = ux * ux + uy * uy + C1
    B2 = vx + vy + C2
    S = (A1 * A2) / (B1 * B2)
    # vector-width store of the broadcast partial sum (Mosaic rejects
    # scalar stores and sub-(8,128) output tiles)
    out_ref[0, 0, :, :] = jnp.full((8, 128), jnp.sum(S), jnp.float32)


def _forward(X, Y, win, k1, k2, data_range, interpret):
    n, c, h, w = X.shape
    kernel = functools.partial(
        _ssim_sum_kernel, win=win, k1=k1, k2=k2, data_range=data_range
    )
    sums = pl.pallas_call(
        kernel,
        grid=(n, c),
        in_specs=[
            pl.BlockSpec((1, 1, h, w), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, h, w), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, 128), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c, 8, 128), jnp.float32),
        interpret=interpret,
    )(X, Y)
    valid = (h - win + 1) * (w - win + 1)
    return 1.0 - jnp.sum(sums[:, :, 0, 0]) / (n * c * valid)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _ssimloss_pallas(X, Y, interpret):
    return _forward(X, Y, 7, 0.01, 0.03, 1.0, interpret)


def _fwd(X, Y, interpret):
    return _forward(X, Y, 7, 0.01, 0.03, 1.0, interpret), (X, Y)


def _bwd(interpret, res, g):
    X, Y = res
    from ..ssim import ssimloss as ref_ssimloss

    _, vjp = jax.vjp(lambda a, b: ref_ssimloss(a, b, impl="jnp"), X, Y)
    dX, dY = vjp(g)
    return dX, dY


_ssimloss_pallas.defvjp(_fwd, _bwd)


def ssimloss_pallas(X, Y, interpret=None):
    """Fused SSIM loss (7x7 uniform window, reference ssimloss.py:11-40)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    return _ssimloss_pallas(X, Y, bool(interpret))
