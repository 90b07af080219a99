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
