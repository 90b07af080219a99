"""Incremental cross-run dedup ingest (state.ingest) — novelty,
idempotent re-runs, index growth."""

import os

import numpy as np

from geoflow.pipelines.flagship import dedup_exact, enrich_pages
from geoflow.sources.pages import pages_dataset
from geoflow.state.ingest import incremental_ingest


def _hashes(n):
    """Distinct content hashes the engine derives for pages_dataset(n)."""
    w = dedup_exact(enrich_pages(pages_dataset(n), slim=True))
    return set(w.to_pandas()["text_hash"])


def test_incremental_ingest_novelty_and_idempotence(ray_session, tmp_path):
    wd = str(tmp_path / "ingest")
    ha = _hashes(400)            # shard A = pages 0..399
    hb = _hashes(700)            # shard B = pages 0..699 (superset corpus)

    novel_a = incremental_ingest(pages_dataset(400), wd, "a").to_pandas()
    assert set(novel_a["text_hash"]) == ha
    assert novel_a["text_hash"].is_unique

    novel_b = incremental_ingest(pages_dataset(700), wd, "b").to_pandas()
    assert set(novel_b["text_hash"]) == hb - ha

    # full re-run of shard B: same novel set (exactly-once, own file
    # excluded from its seen-set), index not double-appended
    novel_b2 = incremental_ingest(pages_dataset(700), wd, "b").to_pandas()
    assert set(novel_b2["text_hash"]) == hb - ha

    # a NEW shard with already-committed content yields zero novelty
    novel_c = incremental_ingest(pages_dataset(400), wd, "c").to_pandas()
    assert len(novel_c) == 0

    # index = union of all committed hashes, partitioned by bucket
    import pyarrow.parquet as pq
    seen = []
    root = os.path.join(wd, "seen")
    for bdir in sorted(os.listdir(root)):
        for f in sorted(os.listdir(os.path.join(root, bdir))):
            assert f.endswith(".parquet") and not f.startswith(".")
            t = pq.read_table(os.path.join(root, bdir, f))
            seen.append(t.column("text_hash").to_numpy())
    all_seen = np.concatenate(seen)
    assert set(all_seen.tolist()) == hb
    assert len(all_seen) == len(hb)     # no hash committed twice


def test_incremental_ingest_rejects_bad_shard_id(ray_session, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        incremental_ingest(pages_dataset(10), str(tmp_path), "a/b")
