"""Coordinate-grid generation — the input pipeline of an INR.

Matches reference utils.py:99-109: a dim-dimensional meshgrid of
``linspace(-scale, scale, sidelen)`` flattened to ``(sidelen**dim, dim)``.
Returned as float32 NumPy (host) so callers decide device placement and
sharding; for the huge 1-D audio grids this is a cheap O(n) linspace.
"""

from __future__ import annotations

import numpy as np


def get_coord(sidelen: int, dim: int = 2, scale: float = 1.0) -> np.ndarray:
    axes = [np.linspace(-scale, scale, sidelen, dtype=np.float32)] * dim
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
    return np.ascontiguousarray(grid.reshape(-1, dim))


def grid_coords_2d(height: int, width: int, width_range=(-1.0, 1.0)) -> np.ndarray:
    """(height*width, 2) grid with rows in [-1,1] and cols in width_range.

    Used by the spectral (freq, time) targets (reference utils.py:276-295,
    382-400) and the multichannel (time, channel) target (utils.py:211-220,
    where a single channel collapses the second axis to 0).
    """
    h = np.linspace(-1.0, 1.0, height, dtype=np.float32)
    w = np.linspace(width_range[0], width_range[1], width, dtype=np.float32)
    hg, wg = np.meshgrid(h, w, indexing="ij")
    return np.stack([hg, wg], axis=-1).reshape(height * width, 2)
