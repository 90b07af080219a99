"""Overview pyramid: exact block sums vs direct numpy pooling,
including non-power-of-two tile counts (ragged regroup)."""

import numpy as np
import pandas as pd
import ray.data as rd

from geoflow.sources import tiles as tsrc
from geoflow.stages import hydrology as hy
from geoflow.stages.pyramid import build_pyramid, pyramid_cells


def direct_level(dem, k):
    H, W = dem.shape
    f = 2 ** k
    return dem.reshape(H // f, f, W // f, f).sum(axis=(1, 3))


def run(dem, tile, levels):
    tab = tsrc.raster_to_tile_table(dem[None].astype(np.float32),
                                    dem.astype(np.float64),
                                    raster_id="pyr", tile=tile)
    return build_pyramid(rd.from_arrow(tab), levels, tile=tile)


def test_all_levels_exact_192():
    dem = hy.hydro_dem(192, 192)
    pyr = run(dem, 64, 4)
    for lv in range(1, 5):
        got = pyramid_cells(pyr[lv], lv, tile=64).to_pandas() \
            .sort_values(["y", "x"]).reset_index(drop=True)
        want = direct_level(dem, lv)
        assert len(got) == want.size, lv
        np.testing.assert_array_equal(
            got["pix_sum"].to_numpy().reshape(want.shape), want)


def test_odd_tile_count_and_small_tiles():
    # 96x96 with tile=32 -> 3 tiles/axis: ragged regroup every level
    dem = hy.hydro_dem(96, 96)
    pyr = run(dem, 32, 3)
    for lv in range(1, 4):
        got = pyramid_cells(pyr[lv], lv, tile=32).to_pandas() \
            .sort_values(["y", "x"]).reset_index(drop=True)
        want = direct_level(dem, lv)
        np.testing.assert_array_equal(
            got["pix_sum"].to_numpy().reshape(want.shape), want)


def test_total_mass_conserved():
    dem = hy.hydro_dem(64, 64)
    pyr = run(dem, 32, 2)
    lv2 = pyramid_cells(pyr[2], 2, tile=32).to_pandas()
    assert lv2["pix_sum"].sum() == dem.sum()
