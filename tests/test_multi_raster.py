"""Multi-raster fit: coefficients are grouped per (raster_id, band) —
the shape that scales the fit pass to fleets of rasters in one dataset."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.context import CorrectionContext
from geoflow.oracle import kernels as ok
from geoflow.sources import tiles as tsrc
from geoflow.stages.corrections import apply_correction_ds, fit_corrections
from geoflow.stages.terrain import derive_terrain

CTX = CorrectionContext()


def test_two_rasters_fit_independently(ray_session):
    import ray.data as rd

    tables = []
    expected = {}
    for rid, seed in (("rasterA", 11), ("rasterB", 77)):
        dem = tsrc.synth_dem(96, 96, seed=seed)
        bands = tsrc.synth_bands(dem, 2, seed=seed, ctx=CTX)
        tables.append(tsrc.raster_to_tile_table(bands, dem, raster_id=rid,
                                                tile=48))
        slope = ok.zt_slope_radians(dem)
        aspect = ok.zt_aspect_radians(dem)
        lum = ok.luminance(slope, aspect, CTX).astype(np.float32)
        lum64 = lum.astype(np.float64).ravel()
        expected[rid] = {}
        for b in range(2):
            band64 = bands[b].astype(np.float64).ravel()
            mask = bands[b].ravel() > CTX.pixel_ignore_threshold
            i64, s64 = np.polynomial.polynomial.polyfit(
                lum64[mask], band64[mask], 1)
            expected[rid][b] = (i64, s64)

    ds = rd.from_arrow(pa.concat_tables(tables)).repartition(8)
    terrain = derive_terrain(ds, CTX)
    coeffs = fit_corrections(terrain, CTX)
    assert set(coeffs) == {"rasterA", "rasterB"}
    for rid in coeffs:
        for b in range(2):
            i64, s64 = expected[rid][b]
            assert coeffs[rid]["bands"][b]["ols_intercept"] == pytest.approx(i64, rel=1e-9)
            assert coeffs[rid]["bands"][b]["ols_slope"] == pytest.approx(s64, rel=1e-9)
    # the two rasters got genuinely different fits
    assert coeffs["rasterA"]["bands"][0]["ols_slope"] != \
        coeffs["rasterB"]["bands"][0]["ols_slope"]

    # apply routes each tile through its own raster's coefficients
    out = apply_correction_ds(terrain, "C-correction", coeffs, CTX).to_pandas()
    assert set(out["raster_id"]) == {"rasterA", "rasterB"}
    assert len(out) == len(ds.to_pandas())
