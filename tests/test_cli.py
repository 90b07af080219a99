"""Job-submit CLI entrypoint (geoflow.cli)."""

import json

from geoflow.cli import main


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "flagship_zonal" in out["queries"]
    assert "revenue_by_region" in out["duckdb_verified"]


def test_cli_query(ray_session, capsys, sf_small):
    assert main(["query", "distinct_langs", "--sf-dir", sf_small]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] >= 1


def test_cli_flagship_checkpointed_resume(ray_session, capsys, tmp_path):
    from geoflow.sources.pages import write_pages_parquet

    pages_dir = str(tmp_path / "pages")
    work = str(tmp_path / "work")
    write_pages_parquet(pages_dir, 400, num_blocks=4)

    argv = ["flagship", "--pages-dir", pages_dir, "--work-dir", work,
            "--shards", "4"]
    assert main(argv) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    n_shards = first["stages"]["enrich"]["processed"]
    assert n_shards >= 1
    assert first["stages"]["enrich"]["skipped"] == 0

    # identical rerun: every partition is a manifest hit
    assert main(argv) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["stages"]["enrich"]["processed"] == 0
    assert second["stages"]["enrich"]["skipped"] == n_shards
    assert second["stages"]["zonal"]["skipped"] == 1


def test_cli_correct_geotiff_roundtrip(ray_session, capsys, tmp_path):
    """Real-raster loop: GeoTIFF in -> distributed correction -> GeoTIFF
    out, corrected pixels matching the full-array oracle."""
    import numpy as np
    from geoflow.oracle import kernels as ok
    from geoflow.sources.geotiff import read_geotiff, write_geotiff
    from geoflow.sources.tiles import synth_dem

    dem = synth_dem(96, 96, seed=3)
    src = str(tmp_path / "dem.tif")
    out_dir = str(tmp_path / "corr")
    write_geotiff(src, dem, pixel_scale=(1.0, 1.0), tiepoint=(5.0, 50.0))
    assert main(["correct", "--raster", src, "--algorithm", "COSINE-T",
                 "--output", out_dir]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["geotiff"].endswith("corrected.tif")
    bands, meta = read_geotiff(res["geotiff"])
    assert bands.shape == (1, 96, 96)
    exp, _ = ok.correct_raster("COSINE-T", dem[None], dem)
    assert np.allclose(bands[0], np.nan_to_num(exp[0], nan=0.0),
                       atol=1e-4, equal_nan=True)
