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


def test_upsample_bilinear_tiled_matches_full(ray_session):
    """Tiled halo-fed 2x upsample == single-array reference (clamped
    edges), block sum for block sum."""
    import ray.data as rd

    from geoflow.sources import tiles as tsrc
    from geoflow.stages.hydrology import hydro_dem
    from geoflow.stages.pyramid import upsample_bilinear_2x

    H = W = 96
    dem = hydro_dem(H, W).astype(np.int64)
    t = tsrc.raster_to_tile_table(dem[None].astype(np.float32),
                                  dem.astype(np.float64), tile=32)
    got = upsample_bilinear_2x(rd.from_arrow(t), H, W, tile=32,
                               block=16).to_pandas()
    got = {(r.by, r.bx): (r.n_pix, r.out16_sum)
           for r in got.itertuples(index=False)}

    p = np.pad(dem, 1, mode="edge")
    out = np.empty((2 * H, 2 * W), dtype=np.int64)
    for dy in (0, 1):
        oy = 2 * dy - 1
        for dx in (0, 1):
            ox = 2 * dx - 1
            out[dy::2, dx::2] = (9 * p[1:H + 1, 1:W + 1]
                                 + 3 * p[1 + oy:H + 1 + oy, 1:W + 1]
                                 + 3 * p[1:H + 1, 1 + ox:W + 1 + ox]
                                 + p[1 + oy:H + 1 + oy,
                                     1 + ox:W + 1 + ox])
    want = {}
    s = out.reshape(2 * H // 16, 16, 2 * W // 16, 16).sum(axis=(1, 3))
    for by in range(s.shape[0]):
        for bx in range(s.shape[1]):
            want[(by, bx)] = (256, int(s[by, bx]))
    assert got == want
    # interpolation sanity: total mass is near-preserved (clamp edges
    # add boundary weight, so only near), and constant rasters are
    # reproduced exactly
    flat = np.full((8, 8), 7)
    tf = tsrc.raster_to_tile_table(flat[None].astype(np.float32),
                                   flat.astype(np.float64), tile=4)
    g2 = upsample_bilinear_2x(rd.from_arrow(tf), 8, 8, tile=4,
                              block=8).to_pandas()
    assert (g2["out16_sum"] == 7 * 16 * 64).all()


def test_elevation_profile_exact(ray_session):
    import numpy as np
    import ray.data as rd

    from geoflow.sources import tiles as tsrc
    from geoflow.stages.hydrology import hydro_dem
    from geoflow.stages.pyramid import elevation_profile

    H = W = 128
    dem = hydro_dem(H, W)
    tbl = tsrc.raster_to_tile_table(dem[None].astype(np.float32),
                                    dem.astype(np.float64),
                                    raster_id="r0", tile=32)
    tiles = rd.from_arrow(tbl)
    # integer-coordinate samples reproduce the DEM exactly; fractional
    # ones match the direct integer bilinear formula
    sid = np.arange(6, dtype=np.int64)
    yc = np.array([0, 50, 126, 10, 31, 63], np.int64)
    xc = np.array([0, 7, 126, 90, 31, 63], np.int64)
    fy = np.array([0, 0, 0, 128, 255, 1], np.int64)
    fx = np.array([0, 0, 0, 64, 1, 255], np.int64)
    out = elevation_profile(tiles, sid, yc, xc, fy, fx, tile=32) \
        .to_pandas().set_index("sample_id")["elev65536"]
    for i in range(6):
        y, x, a, b = yc[i], xc[i], fy[i], fx[i]
        exp = ((256 - a) * (256 - b) * dem[y, x]
               + (256 - a) * b * dem[y, x + 1]
               + a * (256 - b) * dem[y + 1, x]
               + a * b * dem[y + 1, x + 1])
        assert out[i] == exp
    assert out[0] == dem[0, 0] * 65536
