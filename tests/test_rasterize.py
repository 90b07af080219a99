"""Scanline polygon rasterization: point-test parity + tie semantics."""

import numpy as np

from geoflow.stages.pip_join import make_polygons, point_in_ring
from geoflow.stages.rasterize import ring_closed, scanline_runs


def cells_by_point_test(ring, W, H):
    got = set()
    ymin = int(max(0, np.floor((ring[:, 1].min() + 90) * H / 180) - 2))
    ymax = int(min(H, np.ceil((ring[:, 1].max() + 90) * H / 180) + 2))
    for iy in range(ymin, ymax):
        lat = np.full(W, -90.0 + (iy + 0.5) * 180.0 / H)
        lon = -180.0 + (np.arange(W) + 0.5) * 360.0 / W
        m = point_in_ring(lat, lon, ring)
        got |= {(iy, int(ix)) for ix in np.nonzero(m)[0]}
    return got


def test_scanline_matches_point_test_all_fixture_polygons():
    """Scanline spans == per-cell even-odd point test, cell for cell,
    for every fixture polygon (convex fans, concave stars, overlaps)
    on the query's 512x256 grid."""
    W, H = 512, 256
    for _, r in make_polygons(64, seed=42).iterrows():
        ring = ring_closed(np.asarray(r["ring"]))
        runs = scanline_runs(ring, W, H, 0, H)
        got = {(iy, ix) for iy, a, z in runs for ix in range(a, z)}
        assert got == cells_by_point_test(ring, W, H), r["region_id"]


def test_scanline_row_block_partition():
    """Union of disjoint row blocks == full extraction (the
    distributed decomposition)."""
    W, H = 128, 64
    ring = ring_closed(np.asarray(make_polygons(8, seed=7)
                                  .iloc[3]["ring"]))
    full = set(map(tuple, scanline_runs(ring, W, H, 0, H)))
    split = set()
    for lo in range(0, H, 5):
        split |= set(map(tuple,
                         scanline_runs(ring, W, H, lo, min(lo + 5, H))))
    assert split == full


def test_exact_tie_center_on_crossing():
    """A center exactly AT a crossing is inside at the span's left
    crossing (odd count of strictly-greater crossings) and outside at
    the right — matching the strict xc < xin point predicate."""
    W, H = 8, 4
    # vertical edges at lon -22.5 and 22.5 == centers of ix 3 and 4
    ring = np.array([[-22.5, 0.0], [22.5, 0.0],
                     [22.5, 30.0], [-22.5, 30.0]])
    runs = scanline_runs(ring, W, H, 0, H)
    # the only row center inside y in (0, 30) is iy=2 (lat 22.5); the
    # tied center ix=3 (lon -22.5) is in, the tied ix=4 (lon 22.5) out
    assert runs == [(2, 3, 4)]
    got = {(iy, ix) for iy, a, z in runs for ix in range(a, z)}
    assert got == cells_by_point_test(ring, W, H)
