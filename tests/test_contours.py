"""Marching-squares contours: tiled==full parity, topology invariant,
case-table sanity."""

import numpy as np
import pytest

from geoflow.stages.contours import (CASE_SEGMENTS, contour_segments,
                                     segments_from_grid)


def full_raster_segments(dem: np.ndarray, levels):
    """Reference: one 'tile' covering the whole raster (halo values
    never read — every owned cell is interior)."""
    h, w = dem.shape
    p = np.pad(dem.astype(np.float64), 1, mode="edge")
    return segments_from_grid(p, levels, 0, 0, h, w, h, w)


def seg_set(cols):
    return set(zip(cols["level"].tolist(), cols["x1"].tolist(),
                   cols["y1"].tolist(), cols["x2"].tolist(),
                   cols["y2"].tolist()))


def test_case_table_crossing_consistency():
    """Each case's segments use each crossed edge exactly once."""
    corners_of_edge = [(0, 1), (1, 2), (2, 3), (3, 0)]
    for c, segs in enumerate(CASE_SEGMENTS):
        inside = [(c >> k) & 1 for k in range(4)]
        crossed = [e for e, (a, b) in enumerate(corners_of_edge)
                   if inside[a] != inside[b]]
        used = [e for s in segs for e in s]
        assert sorted(used) == sorted(crossed), c


@pytest.mark.parametrize("tile", [16, 23, 64])
def test_tiled_matches_full(ray_session, tile):
    """The distributed risk: tile ownership + halo must reproduce the
    single-pass full-raster extraction bit-for-bit, including ragged
    edge tiles (tile=23 does not divide 96)."""
    import ray.data as rd

    from geoflow.sources import tiles as tsrc
    from geoflow.stages.hydrology import hydro_dem

    dem = hydro_dem(96, 96)
    levels = [3000, 12000, 30000]
    t = tsrc.raster_to_tile_table(dem[None].astype(np.float32),
                                  dem.astype(np.float64), tile=tile)
    got = contour_segments(rd.from_arrow(t), levels, 96, 96,
                           tile=tile).to_pandas()
    want = full_raster_segments(dem, levels)
    got_set = set(zip(got["level"], got["x1"], got["y1"],
                      got["x2"], got["y2"]))
    assert got_set == seg_set(want)
    assert len(got) == len(want["level"])


def test_topology_degree_invariant():
    """Every contour vertex (crossed edge midpoint) has degree 2
    unless the edge lies on the raster boundary ring (degree 1):
    contours are closed loops or boundary-to-boundary paths. This is
    independent of the case-table transcription the SQL twin shares."""
    from collections import Counter

    from geoflow.stages.hydrology import hydro_dem

    dem = hydro_dem(64, 64)
    h, w = dem.shape
    assert dem.min() < 1000 and dem.max() > 12000
    for lv in [1000, 4000, 12000]:
        segs = full_raster_segments(dem, [lv])
        deg = Counter()
        for x1, y1, x2, y2 in zip(segs["x1"], segs["y1"],
                                  segs["x2"], segs["y2"]):
            deg[(x1, y1)] += 1
            deg[(x2, y2)] += 1
        assert deg, lv
        for (x, y), d in deg.items():
            on_boundary = (x == 0 or y == 0 or x == 2 * (w - 1)
                           or y == 2 * (h - 1))
            assert d == (1 if on_boundary else 2), (lv, x, y, d)


def test_flat_and_extreme_levels():
    dem = np.full((8, 8), 5)
    assert len(full_raster_segments(dem, [3])["level"]) == 0  # all >=
    assert len(full_raster_segments(dem, [9])["level"]) == 0  # none >=
