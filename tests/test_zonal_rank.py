"""Zone-aware (classification-map) evaluation parity."""

import numpy as np
import pytest

from geoflow.context import CorrectionContext
from geoflow.oracle.eval import oracle_merge_rank, oracle_metrics_table_zonal
from geoflow.pipelines.rank import (compute_metrics_table_zonal,
                                    export_rank_report, rank_corrections,
                                    rank_corrections_zonal)
from geoflow.sources import tiles as tsrc
from geoflow.stages.metrics import METRIC_IDS

CTX = CorrectionContext()
H = W = 96
NAMES = ["COSINE-T", "SCS", "Minnaert"]


@pytest.fixture(scope="module")
def zoned_fixture(ray_session):
    import ray.data as rd
    dem = tsrc.synth_dem(H, W, seed=5)
    bands = tsrc.synth_bands(dem, 2, seed=5, ctx=CTX)
    zones = tsrc.synth_zones(H, W, seed=5)
    ds = rd.from_arrow(tsrc.raster_to_tile_table(bands, dem, tile=32,
                                                 zones=zones))
    return ds, dem, bands, zones


def test_zonal_metrics_match_oracle(zoned_fixture):
    ds, dem, bands, zones = zoned_fixture
    got = compute_metrics_table_zonal(ds, NAMES, CTX).sort_index()
    exp = oracle_metrics_table_zonal(bands, dem, zones, NAMES, CTX).sort_index()
    assert list(got.index) == list(exp.index)
    zone_vals = got.index.get_level_values(2).unique()
    assert set(zone_vals) == set(np.unique(zones))  # incl. rare zone 9
    for m in METRIC_IDS:
        atol = 1e-5 if m == "determination_coefficient" else 1e-9
        np.testing.assert_allclose(got[m], exp[m], rtol=1e-5, atol=atol,
                                   err_msg=m)


def test_zonal_rank_per_zone(zoned_fixture):
    ds, dem, bands, zones = zoned_fixture
    ranks = rank_corrections_zonal(ds, NAMES, CTX)
    assert set(ranks) == set(int(z) for z in np.unique(zones))
    exp_metrics = oracle_metrics_table_zonal(bands, dem, zones, NAMES, CTX)
    for zone, scores in ranks.items():
        sub = exp_metrics.xs(zone, level=2)
        exp_scores, _ = oracle_merge_rank(sub)
        assert list(scores.index) == list(exp_scores.index), f"zone {zone}"
        np.testing.assert_allclose(scores["Score"], exp_scores["Score"],
                                   rtol=1e-6)


def test_export_rank_report(zoned_fixture, tmp_path):
    ds, *_ = zoned_fixture
    scores, metrics, normalized = rank_corrections(ds, NAMES, CTX)
    paths = export_rank_report(scores, metrics, normalized, str(tmp_path))
    import pandas as pd
    for p in paths:
        if p.endswith(".csv"):
            assert len(pd.read_csv(p)) > 0
    import zipfile
    xlsx = [p for p in paths if p.endswith(".xlsx")]
    assert len(xlsx) == 1
    with zipfile.ZipFile(xlsx[0]) as z:
        assert "xl/worksheets/sheet1.xml" in z.namelist()
    back = pd.read_parquet(tmp_path / "scores.parquet")
    assert list(back["correction"]) == list(scores.index)
