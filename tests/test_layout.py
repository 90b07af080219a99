"""Clustered layout: pruned reads match brute-force filters, and zone
maps actually skip files."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from geoflow.state.layout import read_pruned, write_clustered


def _make(tmp_path, n=5000, parts=10):
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 1000, size=n).astype(np.int64)
    t = pa.table({"k": keys, "v": np.arange(n, dtype=np.int64)})
    out = str(tmp_path / "clustered")
    man = write_clustered(rd.from_arrow(t), "k", out, num_partitions=parts)
    return t, out, man


def test_pruned_read_exact_and_skips_files(ray_session, tmp_path):
    t, out, man = _make(tmp_path)
    assert len(man["partitions"]) > 1
    for lo, hi in [(100, 299), (0, 0), (999, 999), (950, 2000)]:
        ds, stats = read_pruned(out, lo, hi)
        got = (ds.to_pandas().sort_values("v").reset_index(drop=True)
               if ds is not None else None)
        k = t.column("k").to_numpy()
        keep = (k >= lo) & (k <= hi)
        assert (0 if got is None else len(got)) == keep.sum()
        if got is not None:
            assert got["v"].tolist() == sorted(
                np.asarray(t.column("v"))[keep].tolist())
        assert stats["files_read"] < stats["files_total"]

    # empty range prunes everything
    ds, stats = read_pruned(out, 5000, 6000)
    assert ds is None and stats["files_read"] == 0


def test_rewrite_is_idempotent(ray_session, tmp_path):
    import json
    import os

    t, out, man = _make(tmp_path, n=1000, parts=4)
    files = {f: os.path.getsize(os.path.join(out, f))
             for f in os.listdir(out) if f.endswith(".parquet")}
    man2 = write_clustered(rd.from_arrow(t), "k", out, num_partitions=4)
    assert man2 == man
    with open(os.path.join(out, "_manifest.json")) as f:
        assert json.load(f) == man
    files2 = {f: os.path.getsize(os.path.join(out, f))
              for f in os.listdir(out) if f.endswith(".parquet")}
    assert files2 == files
