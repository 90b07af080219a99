"""User-extension surface: custom corrections and metrics flow through
the distributed pipelines (reference plugin-API parity, SURVEY.md 2.7)."""

import numpy as np
import pytest

import geoflow.registry as reg
from geoflow.context import CorrectionContext
from geoflow.sources import tiles as tsrc

CTX = CorrectionContext()


@pytest.fixture()
def tile_ds(ray_session):
    import ray.data as rd
    dem = tsrc.synth_dem(64, 64, seed=2)
    bands = tsrc.synth_bands(dem, 2, seed=2, ctx=CTX)
    return rd.from_arrow(tsrc.raster_to_tile_table(bands, dem, tile=32))


def test_custom_correction_runs_distributed(tile_ds):
    from geoflow.pipelines.correction import run_correction

    name = "GAIN2-TEST"

    @reg.register_correction(name)
    def gain2(I, L, slope_rad, coeffs, band_idx, ctx):
        return (I * np.float32(2.0)).astype(np.float32)

    try:
        out, _ = run_correction(tile_ds, name, CTX)
        df = out.to_pandas()
        for row in df.itertuples(index=False):
            np.testing.assert_array_equal(
                np.asarray(row.corrected, np.float32),
                np.asarray(row.pixels, np.float32) * np.float32(2.0))
    finally:
        del reg.CORRECTIONS[name]


def test_custom_metric_flows_into_rank(tile_ds):
    from geoflow.pipelines.rank import rank_corrections

    mid = "range_test"

    @reg.register_metric(mid, is_reduction=True, weight=0.5)
    def _range(values, orig_min, orig_max, luminance):
        return float(np.max(values) - np.min(values))

    try:
        scores, metrics, normalized = rank_corrections(
            tile_ds, ["COSINE-T", "SCS"], CTX)
        assert mid in metrics.columns
        assert mid in normalized.columns
        assert (metrics[mid] > 0).all()
    finally:
        del reg.METRICS[mid]


def test_unknown_correction_message(tile_ds):
    from geoflow.stages.corrections import apply_correction_ds
    with pytest.raises(KeyError, match="registry"):
        apply_correction_ds(tile_ds, "NOPE", {})
