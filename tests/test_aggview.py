"""Incremental aggregate view: idempotent deltas, compaction crash
safety (manifest excludes absorbed-but-undeleted deltas)."""

import json
import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from geoflow.state.aggview import compact_partition, read_view, refresh


def mk_events(ids, hours, types, values):
    return pd.DataFrame({
        "event_type": types,
        "ts": pd.to_datetime(np.array(hours) * 3600, unit="s"),
        "value": values})


def full(df):
    df = df.copy()
    df["hour_bucket"] = (df["ts"].astype("int64") // 10**9) // 3600
    return df.groupby(["event_type", "hour_bucket"], as_index=False) \
        .agg(n_events=("value", "size"), value_sum=("value", "sum"))


def check(work, want):
    got = read_view(work).sort_values(
        ["event_type", "hour_bucket"]).reset_index(drop=True)
    want = want.sort_values(
        ["event_type", "hour_bucket"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_refresh_idempotent_and_compact(tmp_path):
    work = str(tmp_path)
    a = mk_events(None, [1, 2, 25, 2], ["x", "x", "y", "z"],
                  [1.0, 2.0, 3.0, 4.0])
    b = mk_events(None, [2, 49, 2], ["x", "y", "x"], [5.0, 6.0, 7.0])
    refresh(rd.from_pandas(a), work, "sA")
    refresh(rd.from_pandas(b), work, "sB")
    refresh(rd.from_pandas(b), work, "sB")   # re-run: no double count
    want = full(pd.concat([a, b]))
    check(work, want)
    compact_partition(work, 0)
    check(work, want)
    # compact again (pure base, no deltas) — still stable
    compact_partition(work, 0)
    check(work, want)


def test_crash_between_manifest_and_delete(tmp_path):
    work = str(tmp_path)
    a = mk_events(None, [1, 2], ["x", "y"], [1.0, 2.0])
    refresh(rd.from_pandas(a), work, "sA")
    compact_partition(work, 0)
    # simulate a crash that left an absorbed delta behind: re-create it
    pdir = os.path.join(work, "agg", "part=0")
    mani = json.load(open(os.path.join(pdir, "base.json")))
    assert "sA" in mani["shards"]
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "event_type": ["x"], "hour_bucket": [1],
        "n_events": [1], "value_sum": [1.0]}),
        os.path.join(pdir, "sA.parquet"))
    check(work, full(a))  # manifest excludes it: no double count


def test_new_shard_after_compaction(tmp_path):
    work = str(tmp_path)
    a = mk_events(None, [1], ["x"], [1.0])
    c = mk_events(None, [1, 30], ["x", "x"], [9.0, 1.5])
    refresh(rd.from_pandas(a), work, "sA")
    compact_partition(work, 0)
    refresh(rd.from_pandas(c), work, "sC")
    check(work, full(pd.concat([a, c])))
