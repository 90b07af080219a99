import numpy as np

from geoflow.pipelines import flagship
from geoflow.sources import pages
from geoflow.stages import cells


def _pages_ds(n=800):
    return pages.pages_dataset(n, override_num_blocks=4)


def test_enrich_pipeline(ray_session):
    enriched = flagship.enrich_pages(_pages_ds())
    df = enriched.to_pandas()
    assert len(df) == 800
    assert df["text_ok"].all()  # byte-identical extraction invariant
    assert df["lat"].between(-90, 90).all()
    assert df["lon"].between(-180, 180).all()
    assert np.all(cells.cell_res(df["cell"].to_numpy()) == flagship.PAGE_CELL_RES)


def test_dedup_exact_first_wins(ray_session):
    enriched = flagship.enrich_pages(_pages_ds())
    deduped = flagship.dedup_exact(enriched).to_pandas()
    full = flagship.enrich_pages(_pages_ds()).to_pandas()
    # one row per distinct hash, and it's the min-url one
    expect = (full.sort_values("url").groupby("text_hash", as_index=False)
              .first())
    assert len(deduped) == full["text_hash"].nunique()
    got = deduped.sort_values("text_hash")["url"].tolist()
    want = expect.sort_values("text_hash")["url"].tolist()
    assert got == want
    assert len(deduped) < len(full)  # generator injects dups


def test_zonal_stats_match_pandas(ray_session):
    enriched = flagship.enrich_pages(_pages_ds())
    zonal = flagship.zonal_page_stats(enriched, zone_res=4).to_pandas()
    full = flagship.enrich_pages(_pages_ds()).to_pandas()
    full["zone"] = cells.cell_parent(full["cell"].to_numpy(), 4)
    expect = (full.groupby("zone")
              .agg(n_pages=("url", "size"), n_chars_sum=("n_chars", "sum"))
              .reset_index())
    merged = zonal.merge(expect, on="zone", suffixes=("", "_exp"))
    assert len(merged) == len(expect) == len(zonal)
    assert (merged["n_pages"] == merged["n_pages_exp"]).all()
    assert (merged["n_chars_sum"] == merged["n_chars_sum_exp"]).all()
    # skew exists: hottest zone holds >5% of pages
    assert zonal["n_pages"].max() > 0.05 * len(full)


def test_run_flagship_end_to_end(ray_session):
    out = flagship.run_flagship(_pages_ds(400)).to_pandas()
    assert len(out) > 0
    assert out["n_pages"].iloc[0] == out["n_pages"].max()
