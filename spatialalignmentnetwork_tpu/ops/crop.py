"""Center crop-or-pad over the trailing two axes.

Matches the reference semantics (/root/reference/paired_dataset.py:8-29):
per-axis, if the target is smaller the array is center-cropped (extra pixel
goes to the trailing side); if larger it is zero-padded (extra pixel goes to
the trailing side). Works on numpy and jnp arrays of any leading rank.
"""

import numpy as np
import jax.numpy as jnp


def center_crop(data, shape):
    """Crop or zero-pad `data` so its last two dims equal `shape` (h, w)."""
    # dispatch: keep host numpy arrays on the host (data pipeline),
    # device arrays on the device.
    xp = np if isinstance(data, np.ndarray) else jnp
    h_tgt, w_tgt = int(shape[0]), int(shape[1])

    h = data.shape[-2]
    if h_tgt <= h:
        start = (h - h_tgt) // 2
        data = data[..., start : start + h_tgt, :]
    else:
        before = (h_tgt - h) // 2
        after = h_tgt - h - before
        pad = [(0, 0)] * (data.ndim - 2) + [(before, after), (0, 0)]
        data = xp.pad(data, pad)

    w = data.shape[-1]
    if w_tgt <= w:
        start = (w - w_tgt) // 2
        data = data[..., start : start + w_tgt]
    else:
        before = (w_tgt - w) // 2
        after = w_tgt - w - before
        pad = [(0, 0)] * (data.ndim - 2) + [(0, 0), (before, after)]
        data = xp.pad(data, pad)

    return data
