"""Denoising-trajectory visualization (reference: src/dmme/common/vis.py:7-30).

Implemented in pure numpy/jnp — no torchvision. Images are NHWC.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np


def make_grid(images, nrow: int = 8, padding: int = 2, pad_value: float = 0.0):
    """Tile a batch of NHWC images into one (H', W', C) grid image.

    Behavioral match for ``torchvision.utils.make_grid`` (layout only; no
    normalization), used by the reference's ``make_history``.
    """
    images = np.asarray(images)
    n, h, w, c = images.shape
    ncol = min(nrow, n)
    nrows = int(math.ceil(n / ncol))
    grid_h = nrows * (h + padding) + padding
    grid_w = ncol * (w + padding) + padding
    grid = np.full((grid_h, grid_w, c), pad_value, dtype=images.dtype)
    for idx in range(n):
        r, col = divmod(idx, ncol)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[y : y + h, x : x + w] = images[idx]
    return grid


def make_history(history: Sequence):
    """Visualize a diffusion trajectory.

    ``history`` is a list of NHWC batches captured along the reverse process.
    A single frame is tiled into a near-square grid; multiple frames are laid
    out one trajectory per row, time increasing left to right
    (reference: src/dmme/common/vis.py:14-28).
    """
    history = [np.asarray(x) for x in history]
    if len(history) == 1:
        img = history[-1]
        batch_size = img.shape[0]
        nrow = 1
        for i in range(int(math.sqrt(batch_size)), 2, -1):
            if batch_size % i == 0:
                nrow = batch_size // i
                break
        return make_grid(img, nrow=nrow)

    stacked = np.stack(history, axis=1)  # (N, T_vis, H, W, C)
    n, t = stacked.shape[:2]
    flat = stacked.reshape((n * t,) + stacked.shape[2:])
    return make_grid(flat, nrow=t)
