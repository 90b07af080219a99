"""Distributed joins: broadcast (small side) and bucketed hash (both large).

Patterns per the Ray Data guidance (ray_guide "Joins and lookups"):

- small side -> broadcast: ``ray.put`` the lookup once, map over the big
  side (used by orders_by_nation etc. in the query suite; no shuffle).
- both sides large -> ONE-shuffle partitioned hash join: tag each side,
  union the two datasets under a common nullable schema, group by the
  key-hash bucket, and pandas-merge the two sides inside each group.
  Every row moves exactly once; bucket count bounds reducer memory.
  Hot join keys can be pre-salted on the probe side with the same
  mechanism as geoflow.stages.skew (replicate the build rows per salt).

``bucketed_hash_join`` is the portable engine operator;
``Dataset.join`` exists in recent Ray but its semantics/layout are
version-dependent — the explicit form keeps behavior pinned.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _tag_side(side: int, key_col: str, out_key: str, num_buckets: int,
              all_cols: list[str]):
    def _f(b: pa.Table) -> pa.Table:
        keys = b.column(key_col).to_numpy().astype(np.int64)
        bucket = ((keys * 0x9E3779B97F4A7C15) % num_buckets).astype(np.int32)
        cols = {
            out_key: pa.array(keys, pa.int64()),
            "_bucket": pa.array(np.abs(bucket), pa.int32()),
            "_side": pa.array(np.full(len(keys), side, dtype=np.int8)),
        }
        for c in all_cols:
            if c in b.column_names:
                cols[c] = b.column(c)
            else:
                cols[c] = pa.nulls(len(keys))
        return pa.table(cols)
    return _f


def bucketed_hash_join(left_ds, right_ds, left_key: str, right_key: str,
                       num_buckets: int = 32, how: str = "inner"):
    """Inner/left join of two large Datasets on int64 keys.

    Output columns: ``_key`` + all non-key columns of both sides.
    One groupby shuffle total; within each bucket group a pandas merge
    joins the two sides.
    """
    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    left_cols = [c for c in left_schema.names if c != left_key]
    right_cols = [c for c in right_schema.names if c != right_key]
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"column collision: {overlap}")
    all_cols = left_cols + right_cols
    # target dtypes: the union pads the other side's columns with nulls,
    # which turns int columns float in pandas — restore after the merge
    arrow_types = {}
    for name, t in zip(left_schema.names, left_schema.types):
        arrow_types[name] = t
    for name, t in zip(right_schema.names, right_schema.types):
        arrow_types[name] = t
    int_cols = [c for c in all_cols
                if pa.types.is_integer(arrow_types.get(c, pa.null()))]

    tagged_left = left_ds.map_batches(
        _tag_side(0, left_key, "_key", num_buckets, all_cols),
        batch_format="pyarrow")
    tagged_right = right_ds.map_batches(
        _tag_side(1, right_key, "_key", num_buckets, all_cols),
        batch_format="pyarrow")
    unioned = tagged_left.union(tagged_right)

    def _join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lt = g[g["_side"] == 0][["_key"] + left_cols]
        rt = g[g["_side"] == 1][["_key"] + right_cols]
        out = lt.merge(rt, on="_key", how=how)
        for c in int_cols:
            if c in out.columns and out[c].notna().all():
                out[c] = out[c].astype(np.int64)
        return out

    return unioned.groupby("_bucket").map_groups(
        _join_bucket, batch_format="pandas")


def grouped_asof_join(left_ds, right_ds, key: tuple[str, str],
                      on: tuple[str, str], left_cols: list[str],
                      right_cols: list[str], tiebreak: str,
                      num_buckets: int = 32):
    """Distributed backward as-of join (Ray Data has no native one).

    For every left row, pick the single right row with the same key and
    the greatest ``right_on <= left_on`` (ties on ``right_on`` broken by
    the greatest ``tiebreak`` value, so the result is deterministic).
    Inner semantics: left rows with no match are dropped.

    Same one-shuffle layout as ``bucketed_hash_join``: both sides are
    tagged with a key-hash bucket, unioned, and each bucket group runs a
    vectorized ``pandas.merge_asof(by=key)`` — per-key state never
    leaves a reducer, and the shuffle moves each row exactly once.
    Partitioning assumption: all rows of one key land in one bucket
    group (guaranteed by hashing the key itself).
    """
    left_key, right_key = key
    left_on, right_on = on

    lcols = [c for c in left_cols if c not in (left_key,)]
    rcols = [c for c in right_cols if c not in (right_key,)]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"column collision: {overlap}")
    all_cols = lcols + rcols

    tagged_left = left_ds.map_batches(
        _tag_side(0, left_key, "_key", num_buckets, all_cols),
        batch_format="pyarrow")
    tagged_right = right_ds.map_batches(
        _tag_side(1, right_key, "_key", num_buckets, all_cols),
        batch_format="pyarrow")
    unioned = tagged_left.union(tagged_right)

    def _asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lt = g[g["_side"] == 0][["_key"] + lcols].sort_values(left_on)
        rt = (g[g["_side"] == 1][["_key"] + rcols]
              .sort_values([right_on, tiebreak], kind="mergesort"))
        if lt.empty or rt.empty:
            return pd.DataFrame(columns=["_key"] + all_cols)
        rt = rt.rename(columns={right_on: left_on})
        out = pd.merge_asof(lt, rt, on=left_on, by="_key",
                            direction="backward")
        probe = rcols[0] if rcols[0] != right_on else tiebreak
        out = out[out[probe].notna()]
        return out

    return unioned.groupby("_bucket").map_groups(
        _asof_bucket, batch_format="pandas")


def broadcast_range_join(ds, value_col: str, bands: pd.DataFrame,
                         lo_col: str = "lo", hi_col: str = "hi",
                         label_col: str = "band"):
    """Non-equi range join against a small interval table (inner).

    Each row joins the band with ``lo <= value < hi``. The band table
    (sorted, non-overlapping, gaps allowed) is broadcast into the task
    closure as three numpy arrays and probed with ``np.searchsorted`` —
    O(log bands) per row, vectorized across the batch, zero shuffle.
    This is the engine's range-join pattern: the large side streams,
    the interval index rides along (`ray.put`-style broadcast; plain
    closure capture suffices at "table of bands" size).
    """
    b = bands.sort_values(lo_col).reset_index(drop=True)
    lows = b[lo_col].to_numpy(dtype=np.float64)
    highs = b[hi_col].to_numpy(dtype=np.float64)
    if (highs[:-1] > lows[1:]).any():
        raise ValueError("bands overlap")
    labels = b[label_col].to_numpy()

    def _probe(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy().astype(np.float64)
        idx = np.searchsorted(lows, v, side="right") - 1
        ok = (idx >= 0) & (v < highs[np.clip(idx, 0, len(highs) - 1)])
        batch = batch.filter(pa.array(ok))
        hit = labels[idx[ok]]
        return batch.append_column(label_col, pa.array(hit))

    return ds.map_batches(_probe, batch_format="pyarrow")
