"""On-device (jitted) evaluation metrics.

Device-side equivalents of utils/metrics.py (numpy) so validation inside
the jitted test step returns scalars instead of shipping full image batches
to the host — on TPU this keeps the val loop on-device end to end. Each
function matches its host counterpart's semantics exactly (tested in
tests/test_metrics.py).
"""

import jax
import jax.numpy as jnp

from ..ops.ssim import ssim_map


def mse(gt, pred):
    return jnp.mean((gt - pred) ** 2)


def mae(gt, pred):
    return jnp.mean(jnp.abs(gt - pred))


def nmse(gt, pred):
    return jnp.sum((gt - pred) ** 2) / jnp.sum(gt**2)


def psnr(gt, pred, data_range=1.0):
    err = jnp.mean((gt - pred) ** 2)
    return 10.0 * jnp.log10((data_range**2) / err)


def ssim(gt, pred, data_range=1.0):
    """Per-slice valid-window SSIM averaged over the batch ([N,1,H,W])."""
    return jnp.mean(ssim_map(gt, pred, data_range=data_range))


def _hist2d_64(x, y, bins=64, minv=0.0, maxv=1.0):
    """np.histogram2d semantics: values in [minv, maxv], right edge closed."""
    scale = bins / (maxv - minv)
    ix = jnp.clip(jnp.floor((x - minv) * scale), 0, bins - 1).astype(jnp.int32)
    iy = jnp.clip(jnp.floor((y - minv) * scale), 0, bins - 1).astype(jnp.int32)
    valid = (x >= minv) & (x <= maxv) & (y >= minv) & (y <= maxv)
    flat = ix * bins + iy
    counts = jnp.zeros((bins * bins,), jnp.float32).at[flat].add(
        valid.astype(jnp.float32)
    )
    return counts.reshape(bins, bins)


def _xlogy(x, y):
    return jnp.where(x == 0.0, 0.0, x * jnp.log(jnp.where(x == 0.0, 1.0, y)))


def mi_per_slice(gt, pred, bins=64, minVal=0.0, maxVal=1.0):
    """Per-slice 64-bin joint-histogram mutual information -> [N]
    (reference metrics.py:55-69 semantics)."""

    def one(x, y):
        pxy = _hist2d_64(x.reshape(-1), y.reshape(-1), bins, minVal, maxVal)
        pxy = pxy / (pxy.sum() + 1e-10)
        px = pxy.sum(axis=1)
        py = pxy.sum(axis=0)
        pxpy = px[:, None] * py[None, :]
        return (_xlogy(pxy, pxy) - _xlogy(pxy, pxpy)).sum()

    return jax.vmap(one)(gt, pred)


def mi(gt, pred, bins=64, minVal=0.0, maxVal=1.0):
    """Batch-averaged per-slice mutual information."""
    return jnp.mean(mi_per_slice(gt, pred, bins, minVal, maxVal))


# ------------------------------------------------ per-slice reductions
# Used by the padded (bucketed) eval step: each returns [N] so pad slices
# can be masked out of the volume mean without a recompile per slice count.
def mse_per_slice(gt, pred):
    return jnp.mean((gt - pred) ** 2, axis=(1, 2, 3))


def mae_per_slice(gt, pred):
    return jnp.mean(jnp.abs(gt - pred), axis=(1, 2, 3))


def ssim_per_slice(gt, pred, data_range=1.0):
    return jnp.mean(
        ssim_map(gt, pred, data_range=data_range), axis=(1, 2, 3)
    )
