"""Local normalized cross-correlation registration loss.

Matches the reference library loss (lnccloss.py:7-65): 9x9 zero-padded SAME
windows, cc = cross^2 / (I_var * J_var + 1e-5), loss = -mean(cc); multi-scale
variant smooths with a Gaussian and 2x avg-pools between scales.
"""

import os

import jax
import jax.numpy as jnp

from .window import window_sum2d, avg_pool2d_nchw
from .mi import gaussian_smooth


def compute_local_sums(I, J, win: int):
    I_sum = window_sum2d(I, win, "SAME")
    J_sum = window_sum2d(J, win, "SAME")
    I2_sum = window_sum2d(I * I, win, "SAME")
    J2_sum = window_sum2d(J * J, win, "SAME")
    IJ_sum = window_sum2d(I * J, win, "SAME")

    win_size = win * win
    u_I = I_sum / win_size
    u_J = J_sum / win_size

    cross = IJ_sum - u_J * I_sum - u_I * J_sum + u_I * u_J * win_size
    I_var = I2_sum - 2 * u_I * I_sum + u_I * u_I * win_size
    J_var = J2_sum - 2 * u_J * J_sum + u_J * u_J * win_size
    return I_var, J_var, cross


def lncc_loss(I: jnp.ndarray, J: jnp.ndarray, win: int = 9,
              impl: str = None) -> jnp.ndarray:
    assert I.ndim == 4, "expected [N, C, H, W]"
    impl = impl or os.environ.get("SAN_TPU_LNCC", "auto")
    if impl == "pallas" or (
        impl == "auto" and jax.default_backend() in ("tpu", "axon")
    ):
        from .pallas.lncc import lncc_loss_pallas

        return lncc_loss_pallas(I, J, win)
    I_var, J_var, cross = compute_local_sums(I, J, win)
    cc = cross * cross / (I_var * J_var + 1e-5)
    return -jnp.mean(cc)


def ms_lncc_loss(I, J, win: int = 9, ms: int = 3, sigma: float = 3.0):
    loss = lncc_loss(I, J, win)
    for _ in range(ms - 1):
        I = avg_pool2d_nchw(gaussian_smooth(I, sigma))
        J = avg_pool2d_nchw(gaussian_smooth(J, sigma))
        loss = loss + lncc_loss(I, J, win)
    return loss / ms
