"""D8 hydrology: engine (tile-local + entry-graph) vs full-raster brute
force — flow direction, basin labels and flow accumulation must match
exactly (all-integer arithmetic)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from geoflow.sources import tiles as tsrc
from geoflow.stages import hydrology as hy


def brute_fdir(dem):
    """Independent per-cell loop: steepest drop, compass priority."""
    H, W = dem.shape
    nxt = np.full((H, W), -1, dtype=np.int64)
    for y in range(H):
        for x in range(W):
            best_m, best = 0, -1
            for pri, dy, dx, wt in hy.D8_OFFSETS:
                ny, nx_ = y + dy, x + dx
                if not (0 <= ny < H and 0 <= nx_ < W):
                    continue
                drop = int(dem[y, x]) - int(dem[ny, nx_])
                if drop <= 0:
                    continue
                m = drop * drop * wt
                if m > best_m:
                    best_m, best = m, ny * W + nx_
            nxt[y, x] = best
    return nxt.ravel()


def brute_paths(nxt):
    """Follow every origin to its sink: (basin per cell, acc per cell)."""
    n = len(nxt)
    basin = np.full(n, -1, dtype=np.int64)
    acc = np.zeros(n, dtype=np.int64)
    for o in range(n):
        c = o
        while True:
            acc[c] += 1
            if nxt[c] < 0:
                break
            c = nxt[c]
        basin[o] = c
    return basin, acc


def run_engine(dem, tile):
    H, W = dem.shape
    bands = dem[None].astype(np.float32)
    tab = tsrc.raster_to_tile_table(bands, dem.astype(np.float64),
                                    raster_id="hydro", tile=tile)
    fl = hy.flow_tiles(rd.from_arrow(tab), H, W, tile, tile).materialize()
    flow_df = fl.to_pandas()
    sink_of, inflow = hy.entry_graph(flow_df, tile, tile, W)
    basins = hy.basin_labels(fl, sink_of, tile, tile, W).to_pandas()
    acc = hy.accumulation(fl, inflow, tile, tile, H, W).to_pandas()
    basins = basins.sort_values("cell").reset_index(drop=True)
    acc = acc.sort_values("cell").reset_index(drop=True)
    return fl, basins, acc


def check(dem, tile):
    H, W = dem.shape
    fl, basins, acc = run_engine(dem, tile)
    nxt = brute_fdir(dem)
    b_basin, b_acc = brute_paths(nxt)
    assert (basins["cell"].to_numpy() == np.arange(H * W)).all()
    np.testing.assert_array_equal(basins["basin"].to_numpy(), b_basin)
    np.testing.assert_array_equal(acc["acc"].to_numpy(), b_acc)
    # engine's per-cell next pointers match brute force too
    from geoflow.stages.hydrology import _explode
    ex = pd.concat(
        [_explode(b, tile, tile, W, ["next_cell"]).to_pandas()
         for b in fl.iter_batches(batch_format="pyarrow")])
    ex = ex.sort_values("cell")
    np.testing.assert_array_equal(ex["next_cell"].to_numpy(), nxt)


def test_small_ragged_grid():
    """40x56 with tile=16: ragged edge tiles in both axes."""
    dem = hy.hydro_dem(40, 56)
    check(dem, 16)


def test_full_fixture_grid():
    """The 192^2 query fixture at tile=64 (exact basin + acc parity)."""
    dem = hy.hydro_dem(192, 192)
    check(dem, 64)


def test_flats_and_pits():
    """Adversarial: a flat plateau (every cell a sink/own basin), a pit
    next to the raster edge, and a monotone ramp draining off-tile."""
    dem = np.zeros((20, 30), dtype=np.int64)
    dem[:, :10] = 5                      # plateau: all sinks
    dem[5:9, 12:19] = [[9, 9, 9, 9, 9, 9, 9],
                       [9, 3, 2, 3, 9, 9, 9],
                       [9, 3, 1, 3, 9, 9, 9],
                       [9, 9, 9, 9, 9, 9, 9]]  # pit at (7,14)
    dem[:, 20:] = np.arange(10) * 7 + 100    # ramp draining west
    check(dem, 8)
    # plateau cells are their own basins
    nxt = brute_fdir(dem)
    plateau = np.array([y * 30 + x for y in range(20) for x in range(10)])
    interior = [c for c in plateau if c % 30 < 9]
    assert all(nxt[c] == -1 for c in interior)


def test_oracle_doubling_depth_bound():
    """The DuckDB oracle uses 9 doubling rounds (covers paths up to 512
    visits); pin that the 192^2 fixture's longest flow path fits."""
    dem = hy.hydro_dem(192, 192)
    nxt = brute_fdir(dem)
    longest = 0
    for o in range(len(nxt)):
        c, L = o, 1
        while nxt[c] >= 0:
            c = nxt[c]
            L += 1
        longest = max(longest, L)
    assert longest <= 512, longest


def test_mass_conservation():
    """sum(acc) == total path visits == sum over origins of path length."""
    dem = hy.hydro_dem(64, 64)
    _, _, acc = run_engine(dem, 32)
    nxt = brute_fdir(dem)
    _, b_acc = brute_paths(nxt)
    assert acc["acc"].sum() == b_acc.sum()
    assert (acc["acc"] >= 1).all()


def test_entry_graph_driver_assembly_guard():
    # metadata-only fixture claiming 100M cells: the guard must fire
    # before any concatenation happens
    df = pd.DataFrame({"height": [10_000], "width": [10_000],
                       "ty": [0], "tx": [0]})
    with pytest.raises(ValueError, match="verification-sized"):
        hy.entry_graph(df, 10_000, 10_000, 10_000)
