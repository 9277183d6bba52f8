"""Image-grid dumping for training visualisation.

Equivalent of torchvision.utils.save_image as used by the reference
(train.py:242-247): tile a [N, 1|3, H, W] batch into a row-major grid with
padding, clamp to a value range, write a JPEG.
"""

import numpy as np


def make_grid(batch, nrow=4, padding=10, value_range=(0, 1), pad_value=0.5):
    """[N, C(1|3), H, W] -> [H', W', 3] uint8 grid."""
    x = np.asarray(batch, dtype=np.float32)
    assert x.ndim == 4 and x.shape[1] in (1, 3)
    lo, hi = value_range
    x = np.clip((x - lo) / (hi - lo), 0.0, 1.0)
    if x.shape[1] == 1:
        x = np.repeat(x, 3, axis=1)
    n, c, h, w = x.shape
    ncol = nrow
    nrows = (n + ncol - 1) // ncol
    H = nrows * h + (nrows + 1) * padding
    W = ncol * w + (ncol + 1) * padding
    grid = np.full((H, W, 3), pad_value, dtype=np.float32)
    for i in range(n):
        r, col = divmod(i, ncol)
        y0 = padding + r * (h + padding)
        x0 = padding + col * (w + padding)
        grid[y0 : y0 + h, x0 : x0 + w] = np.transpose(x[i], (1, 2, 0))
    return (grid * 255).astype(np.uint8)


def save_image(batch, path, nrow=4, padding=10, value_range=(0, 1),
               pad_value=0.5):
    from PIL import Image

    grid = make_grid(batch, nrow, padding, value_range, pad_value)
    Image.fromarray(grid).save(path, quality=90)
