"""Fused Pallas TPU kernel for the LNCC loss forward pass.

Mirrors ops/pallas/ssim.py: one program per (sample, channel) plane, the
five 9x9 SAME-padded window sums + correlation map + reduction fused in
VMEM (the reference formula, lnccloss.py:7-56). Backward via custom VJP
over the closed-form jnp implementation.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .ssim import _window_sum_valid


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _lncc_pallas(I, J, win, interpret):
    return _forward(I, J, win, interpret)


def _fwd(I, J, win, interpret):
    return _forward(I, J, win, interpret), (I, J)


def _bwd(win, interpret, res, g):
    I, J = res
    from ..lncc import lncc_loss as ref_lncc

    # impl='jnp' explicitly to avoid dispatching back into this kernel
    _, vjp = jax.vjp(lambda a, b: ref_lncc(a, b, win, impl="jnp"), I, J)
    return vjp(g)


_lncc_pallas.defvjp(_fwd, _bwd)


def lncc_loss_pallas(I, J, win: int = 9, interpret=None):
    """Fused LNCC loss (reference lnccloss.py:7-34 semantics)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    return _lncc_pallas(I, J, win, bool(interpret))
