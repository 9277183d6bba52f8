"""Fused Pallas TPU kernels for the LNCC loss — forward AND backward.

Mirrors ops/pallas/ssim.py: one program per (sample, channel) plane, the
five 9x9 SAME-padded window sums + correlation map + reduction fused in
VMEM (the reference formula, lnccloss.py:7-56).

The backward (round 3) is the closed-form gradient in one fused kernel.
With cc = cross^2 / (I_var*J_var + eps) and the per-center coefficient
maps G_q = d(cc)/d(q_sum), the SAME-centered window is self-adjoint —
the transposed scatter of a coefficient map is just another SAME window
sum — so the whole gradient is 5 forward window sums + 5 coefficient
maps + 5 scatter window sums on the VPU, never leaving VMEM:

    dL/dI_i = -g/M [box(G_Is) + 2 I_i box(G_I2) + J_i box(G_IJ)]
    dL/dJ_i = -g/M [box(G_Js) + 2 J_i box(G_J2) + I_i box(G_IJ)]
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .ssim import (
    _window_sum_valid,
    _sum_shift_left_cols,
    _sum_shift_left_rows,
)


def _lncc_sum_kernel(i_ref, j_ref, out_ref, *, win):
    pad = win // 2
    I = jnp.pad(i_ref[0, 0].astype(jnp.float32),
                ((pad, pad), (pad, pad)))
    J = jnp.pad(j_ref[0, 0].astype(jnp.float32),
                ((pad, pad), (pad, pad)))

    I_sum = _window_sum_valid(I, win)
    J_sum = _window_sum_valid(J, win)
    I2_sum = _window_sum_valid(I * I, win)
    J2_sum = _window_sum_valid(J * J, win)
    IJ_sum = _window_sum_valid(I * J, win)

    ws = win * win
    u_I = I_sum / ws
    u_J = J_sum / ws
    cross = IJ_sum - u_J * I_sum - u_I * J_sum + u_I * u_J * ws
    I_var = I2_sum - 2 * u_I * I_sum + u_I * u_I * ws
    J_var = J2_sum - 2 * u_J * J_sum + u_J * u_J * ws
    cc = cross * cross / (I_var * J_var + 1e-5)
    out_ref[0, 0, :, :] = jnp.full((8, 128), jnp.sum(cc), jnp.float32)


def _forward(I, J, win, interpret):
    n, c, h, w = I.shape
    kernel = functools.partial(_lncc_sum_kernel, win=win)
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
    )(I, J)
    return -jnp.sum(sums[:, :, 0, 0]) / (n * c * h * w)


def _same_window_sum(a, win):
    """SAME-padded window sum on the full canvas via constant-VMEM
    fori shift-adds (pad then valid-sum, cropped back to [h, w])."""
    pad = win // 2
    ap = jnp.pad(a, ((pad, pad), (pad, pad)))
    full = _sum_shift_left_rows(_sum_shift_left_cols(ap, win), win)
    return full[: a.shape[0], : a.shape[1]]


def _lncc_bwd_kernel(i_ref, j_ref, di_ref, dj_ref, *, win, scale):
    I = i_ref[0, 0].astype(jnp.float32)
    J = j_ref[0, 0].astype(jnp.float32)
    ws = win * win

    I_sum = _same_window_sum(I, win)
    J_sum = _same_window_sum(J, win)
    I2_sum = _same_window_sum(I * I, win)
    J2_sum = _same_window_sum(J * J, win)
    IJ_sum = _same_window_sum(I * J, win)

    cross = IJ_sum - I_sum * J_sum / ws
    I_var = I2_sum - I_sum * I_sum / ws
    J_var = J2_sum - J_sum * J_sum / ws
    D = I_var * J_var + 1e-5
    Pc = 2.0 * cross / D                      # d(cc)/d(cross)
    cc_over_D = (cross * cross) / (D * D)
    Pv_I = -cc_over_D * J_var                 # d(cc)/d(I_var)
    Pv_J = -cc_over_D * I_var

    G_Is = Pc * (-J_sum / ws) + Pv_I * (-2.0 * I_sum / ws)
    G_Js = Pc * (-I_sum / ws) + Pv_J * (-2.0 * J_sum / ws)

    b_Is = _same_window_sum(G_Is, win)
    b_Js = _same_window_sum(G_Js, win)
    b_I2 = _same_window_sum(Pv_I, win)
    b_J2 = _same_window_sum(Pv_J, win)
    b_IJ = _same_window_sum(Pc, win)

    di_ref[0, 0] = (-scale) * (b_Is + 2.0 * I * b_I2 + J * b_IJ)
    dj_ref[0, 0] = (-scale) * (b_Js + 2.0 * J * b_J2 + I * b_IJ)


def _backward(I, J, win, interpret):
    n, c, h, w = I.shape
    scale = 1.0 / (n * c * h * w)
    kernel = functools.partial(_lncc_bwd_kernel, win=win, scale=scale)
    dI, dJ = pl.pallas_call(
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
    )(I, J)
    return dI, dJ


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _lncc_pallas(I, J, win, interpret):
    return _forward(I, J, win, interpret)


def _fwd(I, J, win, interpret):
    return _forward(I, J, win, interpret), (I, J)


def _bwd(win, interpret, res, g):
    I, J = res
    dI, dJ = _backward(I, J, win, interpret)
    g32 = g.astype(jnp.float32)
    return (g32 * dI).astype(I.dtype), (g32 * dJ).astype(J.dtype)


_lncc_pallas.defvjp(_fwd, _bwd)


def lncc_loss_pallas(I, J, win: int = 9, interpret=None):
    """Fused LNCC loss (reference lnccloss.py:7-34 semantics)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    return _lncc_pallas(I, J, win, bool(interpret))
