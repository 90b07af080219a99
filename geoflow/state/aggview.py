"""Incrementally maintained aggregate view (delta-refresh rollup).

The materialized-view pattern a continuously-ingested corpus needs:
an hourly (event_type, hour) rollup kept on disk and refreshed one
shard at a time, WITHOUT ever rescanning committed shards. Layout::

    {work_dir}/agg/part=<day>/<shard_id>.parquet   # shard DELTA
    {work_dir}/agg/part=<day>/base.parquet         # optional compacted
    {work_dir}/agg/part=<day>/base.json            # shards absorbed

- **Refresh** runs the shard through one partial-aggregate map, then a
  ``groupby(day).map_groups`` pass where each task writes ITS day
  partition's pre-aggregated delta atomically (tmp + ``os.replace``).
  Deltas are keyed by shard id, so a task retry or full shard re-run
  overwrites the same file — IDEMPOTENT, exactly-once without a
  coordinator (same contract as ``state.ingest``).
- **Read** is merge-on-read: base (if any) + every delta whose shard id
  is NOT in the base manifest, one small groupby — deltas are already
  hour-level, so the merge touches O(hours x shards) rows, never
  events.
- **Compaction** folds current deltas into a new base: write tmp base,
  ``os.replace`` base.parquet then base.json (manifest lists absorbed
  shards), best-effort delete of absorbed deltas. A crash between the
  two replaces leaves absorbed deltas on disk but the manifest read
  path excludes them — never a double count.

Sums are kept RAW (rounded only at query edges) so partial order never
changes committed state.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

US_PER_HOUR = 3_600_000_000
HOURS_PER_DAY = 24


def _hour_rows(batch: pa.Table) -> pa.Table:
    us = batch.column("ts").to_numpy(zero_copy_only=False).astype(
        "datetime64[us]").view("int64")
    hour = us // US_PER_HOUR
    t = pa.table({"event_type": batch.column("event_type"),
                  "hour_bucket": pa.array(hour, pa.int64()),
                  "value": batch.column("value")})
    g = pa.TableGroupBy(t, ["event_type", "hour_bucket"]).aggregate(
        [("value", "sum"), ([], "count_all")])
    return pa.table({
        "event_type": g.column("event_type"),
        "hour_bucket": g.column("hour_bucket"),
        "n_events": g.column("count_all"),
        "value_sum": g.column("value_sum"),
        "part": pa.array(g.column("hour_bucket").to_numpy()
                         // HOURS_PER_DAY, pa.int64())})


def refresh(events_ds, work_dir: str, shard_id: str):
    """Fold one shard into the view (distributed, idempotent)."""

    def _commit(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["part"].iloc[0])
        out = g.groupby(["event_type", "hour_bucket"], as_index=False) \
            .agg(n_events=("n_events", "sum"),
                 value_sum=("value_sum", "sum"))
        pdir = os.path.join(work_dir, "agg", f"part={part}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, f".{shard_id}.tmp")
        pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
                       tmp)
        os.replace(tmp, os.path.join(pdir, f"{shard_id}.parquet"))
        return pd.DataFrame({"part": [part], "rows": [len(out)]})

    parts = events_ds.map_batches(_hour_rows, batch_format="pyarrow") \
        .groupby("part").map_groups(_commit, batch_format="pandas")
    return parts.to_pandas()


def _partition_frames(pdir: str) -> list[pd.DataFrame]:
    absorbed: set[str] = set()
    mani = os.path.join(pdir, "base.json")
    frames = []
    if os.path.exists(mani):
        absorbed = set(json.load(open(mani))["shards"])
        frames.append(pq.read_table(
            os.path.join(pdir, "base.parquet")).to_pandas())
    for f in sorted(os.listdir(pdir)):
        if not f.endswith(".parquet") or f == "base.parquet":
            continue
        if f[:-len(".parquet")] in absorbed:
            continue
        frames.append(pq.read_table(os.path.join(pdir, f)).to_pandas())
    return frames


def read_view(work_dir: str) -> pd.DataFrame:
    """Merge-on-read of the whole view (hour-level rows only)."""
    root = os.path.join(work_dir, "agg")
    frames = []
    for d in sorted(os.listdir(root)) if os.path.isdir(root) else []:
        pdir = os.path.join(root, d)
        if os.path.isdir(pdir):
            frames.extend(_partition_frames(pdir))
    if not frames:
        return pd.DataFrame({"event_type": [], "hour_bucket": [],
                             "n_events": [], "value_sum": []})
    allf = pd.concat(frames, ignore_index=True)
    return allf.groupby(["event_type", "hour_bucket"], as_index=False) \
        .agg(n_events=("n_events", "sum"), value_sum=("value_sum", "sum"))


def compact_partition(work_dir: str, part: int):
    """Fold the partition's deltas into base.parquet (crash-safe)."""
    pdir = os.path.join(work_dir, "agg", f"part={part}")
    frames = _partition_frames(pdir)
    if not frames:
        return
    prior: set[str] = set()
    mani = os.path.join(pdir, "base.json")
    if os.path.exists(mani):
        prior = set(json.load(open(mani))["shards"])
    shard_files = [f for f in os.listdir(pdir)
                   if f.endswith(".parquet") and f != "base.parquet"
                   and f[:-len(".parquet")] not in prior]
    merged = pd.concat(frames, ignore_index=True) \
        .groupby(["event_type", "hour_bucket"], as_index=False) \
        .agg(n_events=("n_events", "sum"), value_sum=("value_sum", "sum"))
    tmp = os.path.join(pdir, ".base.tmp")
    pq.write_table(pa.Table.from_pandas(merged, preserve_index=False), tmp)
    os.replace(tmp, os.path.join(pdir, "base.parquet"))
    mtmp = os.path.join(pdir, ".mani.tmp")
    with open(mtmp, "w") as fh:
        json.dump({"shards": sorted(
            prior | {f[:-len(".parquet")] for f in shard_files})}, fh)
    os.replace(mtmp, mani)
    for f in shard_files:  # best-effort; manifest already excludes them
        try:
            os.remove(os.path.join(pdir, f))
        except OSError:
            pass
