import numpy as np
import pytest

from geoflow.stages import cells


def test_roundtrip_center():
    rng = np.random.default_rng(7)
    lat = rng.uniform(-89.9, 89.9, 1000)
    lon = rng.uniform(-180, 179.999, 1000)
    for res in (0, 1, 5, 12, 20, 29):
        c = cells.cell_id(lat, lon, res)
        assert c.dtype == np.uint64
        assert np.all(cells.cell_res(c) == res)
        clat, clon = cells.cell_center(c)
        half_lat = 180.0 / (1 << res) / 2
        half_lon = 360.0 / (1 << res) / 2
        assert np.all(np.abs(clat - lat) <= half_lat + 1e-9)
        assert np.all(np.abs(clon - lon) <= half_lon + 1e-9)


def test_parent_contains_child():
    rng = np.random.default_rng(8)
    lat = rng.uniform(-89, 89, 500)
    lon = rng.uniform(-180, 179.99, 500)
    fine = cells.cell_id(lat, lon, 15)
    coarse = cells.cell_parent(fine, 6)
    direct = cells.cell_id(lat, lon, 6)
    assert np.array_equal(coarse, direct)


def test_children_inverse_of_parent():
    c = cells.cell_id(np.array([42.0]), np.array([13.0]), 10)[0]
    kids = cells.cell_children(c)
    assert len(kids) == 4
    assert len(set(kids.tolist())) == 4
    back = cells.cell_parent(kids, 10)
    assert np.all(back == c)


def test_neighbors_ring():
    c = cells.cell_id(np.array([10.0]), np.array([20.0]), 8)
    ring = cells.cell_neighbors(c)
    assert ring.shape == (1, 9)
    assert len(set(ring[0].tolist())) == 9  # interior cell: all distinct
    # each neighbor center within ~2 cell widths
    lat0, lon0 = cells.cell_center(c)
    nlat, nlon = cells.cell_center(ring[0])
    step = 360.0 / (1 << 8)
    assert np.all(np.abs(nlat - lat0[0]) <= 1.5 * step)
    assert np.all(np.abs(nlon - lon0[0]) <= 1.5 * step)


def test_lon_wrap_and_pole_clamp():
    # cell at the antimeridian wraps; cell at the pole clamps (no crash)
    c = cells.cell_id(np.array([0.0, 89.99]), np.array([-179.99, 0.0]), 6)
    ring = cells.cell_neighbors(c)
    assert ring.shape == (2, 9)
    assert np.all(cells.cell_res(ring.ravel()) == 6)


def test_zorder_locality():
    # nearby points at same res share coarse parents
    lat = np.array([50.0, 50.0001])
    lon = np.array([8.0, 8.0001])
    c = cells.cell_id(lat, lon, 10)
    assert c[0] == c[1]


def test_res_validation():
    with pytest.raises(ValueError):
        cells.cell_id([0.0], [0.0], 31)
