"""Focal terrain statistics (TRI / TPI numerator / roughness):
tiled==full brute parity incl. ragged tiles, boundary-true neighbor
counts, hand-checked 2x2 case."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.stages.terrain import focal_stats, focal_stats_batch
from geoflow.sources.tiles import raster_to_tile_table


def brute_focal(dem: np.ndarray):
    """Independent per-pixel loop reference (no halo machinery)."""
    h, w = dem.shape
    d = dem.astype(np.int64)
    rows = {}
    for y in range(h):
        for x in range(w):
            nbrs = [d[y + dy, x + dx]
                    for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                    if (dy, dx) != (0, 0)
                    and 0 <= y + dy < h and 0 <= x + dx < w]
            n = len(nbrs)
            rows[(y, x)] = (
                n,
                int(sum(abs(d[y, x] - v) for v in nbrs)),
                int(n * d[y, x] - sum(nbrs)),
                int(max(nbrs) - min(nbrs)),
            )
    return rows


def table_rows(tbl: pa.Table):
    df = tbl.to_pandas()
    return {(r.y, r.x): (r.n_nbrs, r.tri, r.tpi_num, r.rough)
            for r in df.itertuples()}


@pytest.mark.parametrize("tile", [7, 16])
def test_tiled_matches_brute(ray_session, tile):
    rng = np.random.default_rng(7)
    dem = rng.integers(0, 5000, size=(37, 29))
    tbl = raster_to_tile_table(dem[None].astype(np.float32),
                               dem.astype(np.float64),
                               raster_id="f0", tile=tile)
    import ray.data as rd
    out = focal_stats(rd.from_arrow(tbl), 37, 29, tile)
    got = table_rows(pa.Table.from_pandas(out.to_pandas()))
    assert got == brute_focal(dem)


def test_corner_and_interior_counts():
    dem = np.arange(9, dtype=np.int64).reshape(3, 3) * 10
    tbl = raster_to_tile_table(dem[None].astype(np.float32),
                               dem.astype(np.float64),
                               raster_id="f1", tile=3)
    got = table_rows(focal_stats_batch(tbl, 3, 3, 3))
    # corner has 3 neighbors, edge 5, center 8
    assert got[(0, 0)][0] == 3 and got[(0, 1)][0] == 5
    assert got[(1, 1)][0] == 8
    # center of 0..80 grid: tri = sum |40 - nbr| = 200, tpi_num = 0,
    # rough = 80 - 0
    assert got[(1, 1)] == (8, 200, 0, 80)
    # corner (0,0)=0, nbrs {10,30,40}: tri=80, tpi=3*0-80=-80, rough=30
    assert got[(0, 0)] == (3, 80, -80, 30)


def test_halo_never_leaks(ray_session):
    """Odd-reflect halo values differ from in-raster values; boundary
    masking must keep them out of every statistic: a constant DEM has
    tri == rough == tpi_num == 0 EVERYWHERE (the halo extrapolation of
    a constant is constant, but a ramp's is not — use a ramp and check
    the boundary row against brute force)."""
    dem = np.outer(np.arange(12), np.ones(12, dtype=np.int64)) * 100
    tbl = raster_to_tile_table(dem[None].astype(np.float32),
                               dem.astype(np.float64),
                               raster_id="f2", tile=5)
    got = table_rows(focal_stats_batch(tbl, 12, 12, 5))
    assert got == brute_focal(dem)
