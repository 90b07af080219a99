"""Golden-oracle machinery: VALUES rendering round-trips through DuckDB
and the lazy SQL registry resolves for every raster query."""

import duckdb
import numpy as np


def test_values_sql_roundtrip():
    from geoflow.oracle.fixture_goldens import (golden_correlation_fit,
                                                values_sql)

    golden = golden_correlation_fit()
    back = duckdb.sql(values_sql(golden)).df()
    assert list(back.columns) == list(golden.columns)
    assert len(back) == len(golden)
    for c in golden.columns:
        g = golden[c].to_numpy()
        b = back[c].to_numpy()
        if g.dtype.kind == "f":
            assert (g == b).all()          # repr round-trip is exact
        else:
            assert (g.astype(object) == b.astype(object)).all()


def test_lazy_oracle_sql_resolves():
    from geoflow.pipelines.queries import ORACLE_SQL_LAZY, get_oracle_sql

    sqls = get_oracle_sql()
    for name in ("correction_band_stats", "rose_diagram_means",
                 "correlation_fit", "multi_criteria_scores",
                 "raster_zonal_cells"):
        assert name in ORACLE_SQL_LAZY
        assert "VALUES" in sqls[name]
        duckdb.sql(sqls[name]).df()        # parseable + executable


def test_default_ndv_lookup():
    """GDAL default-NDV table parity (osgeo_utils.gdal_calc
    DefaultNDVLookup; reference util/raster_calc.py:25,176)."""
    from geoflow.oracle.kernels import FLOAT32_NDV, default_ndv

    assert default_ndv(np.uint8) == 255
    assert default_ndv(np.int16) == -32768
    assert default_ndv(np.uint32) == 4294967293
    assert default_ndv(np.int32) == -2147483647
    assert default_ndv(np.float32) == FLOAT32_NDV == 3.402823466e38
    assert default_ndv(np.float64) == 1.7976931348623158e308


def test_golden_scores_shape():
    from geoflow.oracle.fixture_goldens import golden_multi_criteria_scores

    g = golden_multi_criteria_scores()
    assert len(g) == 11                    # all 11 corrections ranked
    assert (np.diff(g["rank"].to_numpy()) == 1).all()
