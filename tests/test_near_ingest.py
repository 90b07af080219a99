"""Cross-run near-dup ingest: novelty vs a persisted LSH index,
idempotent re-runs, brute-force Jaccard parity."""

import numpy as np
import ray.data as rd

from geoflow.stages.dedup import ngram_jaccard
from geoflow.state.near_ingest import incremental_near_ingest

def _text(i: int, n: int = 30) -> str:
    """Per-doc vocabulary — distinct docs share zero word shingles."""
    return " ".join(f"t{i}w{j}" for j in range(n))


def _docs(ids_texts):
    return rd.from_items([{"doc_id": i, "text": t} for i, t in ids_texts])


def test_near_ingest_novelty_and_idempotence(ray_session, tmp_path):
    wd = str(tmp_path / "near")
    run_a = [(i, _text(i)) for i in range(40)]
    novel_a = incremental_near_ingest(_docs(run_a), wd, "a").to_pandas()
    assert sorted(novel_a.doc_id) == list(range(40))  # empty index

    # shard B: near-dups of A (tail append), plus genuinely new docs
    near = [(1000 + i, _text(i) + " extra tail token")
            for i in range(0, 40, 4)]
    fresh = [(2000 + i, _text(500 + i)) for i in range(10)]
    run_b = near + fresh
    # sanity: the constructions sit on the right side of the threshold
    assert ngram_jaccard(_text(0), _text(0) + " extra tail token") >= 0.5
    for i, t in fresh:
        assert all(ngram_jaccard(t, ta) < 0.5 for _, ta in run_a)

    novel_b = incremental_near_ingest(_docs(run_b), wd, "b").to_pandas()
    assert sorted(novel_b.doc_id) == sorted(i for i, _ in fresh)

    # full re-run of shard B: identical novelty (own files excluded)
    novel_b2 = incremental_near_ingest(_docs(run_b), wd, "b").to_pandas()
    assert sorted(novel_b2.doc_id) == sorted(novel_b.doc_id)

    # a new shard whose content is all near-dup of committed docs
    run_c = [(3000 + i, _text(500 + i) + " extra tail token")
             for i in range(10)]
    novel_c = incremental_near_ingest(_docs(run_c), wd, "c").to_pandas()
    assert len(novel_c) == 0

    # brute-force parity: every committed doc set decision matches a
    # driver-side exact-Jaccard scan of run_b vs run_a
    dropped = {i for i, _ in run_b} - set(novel_b.doc_id)
    brute = {i for i, t in run_b
             if any(ngram_jaccard(t, ta) >= 0.5 for _, ta in run_a)}
    assert dropped == brute


def test_near_ingest_rejects_bad_shard_id(ray_session, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        incremental_near_ingest(_docs([(1, "a b c d")]), str(tmp_path),
                                "../x")
