import numpy as np

from inraudio_tpu.data import get_coord
from inraudio_tpu.data.coords import grid_coords_2d


def test_1d_shape_and_endpoints():
    c = get_coord(1000, dim=1)
    assert c.shape == (1000, 1)
    assert c.dtype == np.float32
    assert c[0, 0] == -1.0
    assert c[-1, 0] == 1.0


def test_scale_100():
    """WaveformFittingExp builds coords in [-100, 100] (utils.py:172)."""
    c = get_coord(500, dim=1, scale=100.0)
    assert c[0, 0] == -100.0
    assert c[-1, 0] == 100.0
    np.testing.assert_allclose(np.diff(c[:, 0]), 200.0 / 499.0, rtol=1e-4)


def test_2d_meshgrid_ij_order():
    c = get_coord(3, dim=2)
    assert c.shape == (9, 2)
    # 'ij' indexing: first axis varies slowest.
    np.testing.assert_allclose(c[:3, 0], [-1, -1, -1])
    np.testing.assert_allclose(c[:3, 1], [-1, 0, 1])


def test_grid_coords_2d_single_channel_collapses():
    c = grid_coords_2d(4, 1, width_range=(0.0, 0.0))
    assert c.shape == (4, 2)
    np.testing.assert_allclose(c[:, 1], 0.0)


def test_grid_coords_2d_matches_get_coord_square():
    a = grid_coords_2d(5, 5)
    b = get_coord(5, dim=2)
    np.testing.assert_allclose(a, b, atol=1e-7)
