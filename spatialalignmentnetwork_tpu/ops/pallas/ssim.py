"""Fused Pallas TPU kernels for the SSIM loss — forward AND backward.

One program per (sample, channel) plane: both images live in VMEM and the
five 7x7 window sums + the SSIM map + the reduction happen in a single
fused pass — no window-sum intermediates ever touch HBM (the XLA fallback
materializes fused chains well, but still streams five separable conv
results; here the arithmetic intensity stays on-chip end to end).

Window sums use separable static-shift adds (O(win) adds per axis on the
VPU). Output is one partial sum per plane; the host-side wrapper reduces to
the scalar loss 1 - mean(S).

The BACKWARD is the closed-form gradient fused into one kernel per plane
(round-3; previously jax.vjp over the jnp formulation re-ran the forward
in XLA every training step). With L = 1 - mean(S) over valid windows and
per-window coefficients G_q = dS/d(u_q):

    dL/dx_i = -g/(M*NP) * [box(G_ux) + 2 x_i box(G_uxx) + y_i box(G_uxy)]
    dL/dy_i = -g/(M*NP) * [box(G_uy) + 2 y_i box(G_uyy) + x_i box(G_uxy)]

where box() is the transposed (scatter) window sum — every pixel collects
the coefficients of the windows containing it — computed with the same
separable shift-add trick on the zero-padded coefficient maps. The five
G maps come from re-running the (cheap, VPU-only) window-stat pass inside
the same kernel, so the backward also never touches HBM between stages.
Gradient parity vs the XLA autodiff of the jnp formulation is pinned to
1e-4 in tests/test_pallas.py and on-chip in tests/test_pallas_tpu.py.
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


# ------------------------------------------------------------- backward
# Window sums and their transposed scatters as BANDED-ONES matmuls: a
# Python-unrolled shift loop allocates a canvas per iteration and Mosaic
# sums stack allocations (blowing the 16 MB scoped-VMEM limit across the
# backward's ~9 canvas-sized stages), and Mosaic has no in-register
# dynamic_slice for a fori_loop variant. out = a @ Band (or Band @ a)
# with Band[k, j] = 1 iff k-j in [0, win) is Mosaic-native, runs on the
# MXU, and its live set is one [n, n] matrix + one canvas regardless of
# win. The extra MACs vs the shift formulation are MXU-cheap.
def _band(n, win, flip):
    ki = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    ji = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    d = (ji - ki) if flip else (ki - ji)
    return jnp.logical_and(d >= 0, d < win).astype(jnp.float32)


def _bandmul(a, m):
    return jnp.dot(
        a, m,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _sum_shift_left_cols(a, win):
    """out[i, j] = sum_{d=0..win-1} a[i, j+d] (zero past the edge)."""
    return _bandmul(a, _band(a.shape[1], win, flip=False))


def _sum_shift_left_rows(a, win):
    return _bandmul(_band(a.shape[0], win, flip=True), a)


def _sum_shift_right_cols(a, win):
    """out[i, j] = sum_{d=0..win-1} a[i, j-d] — the transposed scatter."""
    return _bandmul(a, _band(a.shape[1], win, flip=True))


def _sum_shift_right_rows(a, win):
    return _bandmul(_band(a.shape[0], win, flip=False), a)


def _ssim_bwd_kernel(x_ref, y_ref, dx_ref, dy_ref, *, win, k1, k2,
                     data_range, scale):
    x = x_ref[0, 0].astype(jnp.float32)
    y = y_ref[0, 0].astype(jnp.float32)
    h, w = x.shape
    NP = win * win
    inv = 1.0 / NP
    cn = NP / (NP - 1)
    C1 = (k1 * data_range) ** 2
    C2 = (k2 * data_range) ** 2

    def wsum(a):  # full-canvas valid window sums (garbage past the edge)
        return _sum_shift_left_rows(_sum_shift_left_cols(a, win), win)

    ux = wsum(x) * inv
    uy = wsum(y) * inv
    uxx = wsum(x * x) * inv
    uyy = wsum(y * y) * inv
    uxy = wsum(x * y) * inv

    vx = cn * (uxx - ux * ux)
    vy = cn * (uyy - uy * uy)
    vxy = cn * (uxy - ux * uy)
    A1 = 2 * ux * uy + C1
    A2 = 2 * vxy + C2
    B1 = ux * ux + uy * uy + C1
    B2 = vx + vy + C2
    D = B1 * B2
    S = (A1 * A2) / D
    sA1 = A2 / D
    sA2 = A1 / D
    sB1 = -S / B1
    sB2 = -S / B2

    # per-window dS/du_q coefficient maps (chain rule through the five
    # window means); masked to the valid-window region before scattering
    ri = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    m = ((ri < h - win + 1) & (ci < w - win + 1)).astype(jnp.float32)
    G_ux = (sA1 * (2 * uy) + sA2 * (-2 * cn * uy)
            + sB1 * (2 * ux) + sB2 * (-2 * cn * ux)) * m
    G_uy = (sA1 * (2 * ux) + sA2 * (-2 * cn * ux)
            + sB1 * (2 * uy) + sB2 * (-2 * cn * uy)) * m
    G_uxy = (sA2 * (2 * cn)) * m
    G_uvv = (sB2 * cn) * m  # dS/duxx == dS/duyy

    def box(gmap):  # transposed window sum (scatter back over pixels)
        return _sum_shift_right_rows(_sum_shift_right_cols(gmap, win), win)

    b_ux = box(G_ux)
    b_uy = box(G_uy)
    b_xy = box(G_uxy)
    b_vv = box(G_uvv)

    dx_ref[0, 0] = (-scale) * (b_ux + 2.0 * x * b_vv + y * b_xy)
    dy_ref[0, 0] = (-scale) * (b_uy + 2.0 * y * b_vv + x * b_xy)


def _backward(X, Y, win, k1, k2, data_range, interpret):
    n, c, h, w = X.shape
    valid = (h - win + 1) * (w - win + 1)
    scale = 1.0 / (n * c * valid * win * win)
    kernel = functools.partial(
        _ssim_bwd_kernel, win=win, k1=k1, k2=k2, data_range=data_range,
        scale=scale,
    )
    dX, dY = pl.pallas_call(
        kernel,
        grid=(n, c),
        in_specs=[
            pl.BlockSpec((1, 1, h, w), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, h, w), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, h, w), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, h, w), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c, h, w), jnp.float32),
            jax.ShapeDtypeStruct((n, c, h, w), jnp.float32),
        ],
        interpret=interpret,
    )(X, Y)
    return dX, dY


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _ssimloss_pallas(X, Y, interpret):
    return _forward(X, Y, 7, 0.01, 0.03, 1.0, interpret)


def _fwd(X, Y, interpret):
    return _forward(X, Y, 7, 0.01, 0.03, 1.0, interpret), (X, Y)


def _bwd(interpret, res, g):
    X, Y = res
    dX, dY = _backward(X, Y, 7, 0.01, 0.03, 1.0, interpret)
    g32 = g.astype(jnp.float32)
    return (g32 * dX).astype(X.dtype), (g32 * dY).astype(Y.dtype)


_ssimloss_pallas.defvjp(_fwd, _bwd)


def ssimloss_pallas(X, Y, interpret=None):
    """Fused SSIM loss (7x7 uniform window, reference ssimloss.py:11-40)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    return _ssimloss_pallas(X, Y, bool(interpret))
