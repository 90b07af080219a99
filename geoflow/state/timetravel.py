"""Versioned clustered layout: MVCC snapshots + time-travel reads.

Lakehouse-style table versioning on top of the zone-mapped clustered
layout (state/layout.py): every commit writes NEW immutable partition
files plus a complete snapshot manifest ``v{N}.json`` (file list +
zone maps), and flips the ``_latest`` pointer by atomic rename. Files
are never mutated, so

- reading AS OF version N is just "open manifest N" — byte-stable
  forever, concurrent with any writer;
- an overwrite of one key-range partition creates version N+1 that
  REUSES every other partition's files (O(changed data) write cost);
- a crash between file writes and the manifest flip leaves orphan
  data files but never a torn snapshot (readers only follow
  manifests), and re-running the commit is idempotent at the version
  level.

Reads prune by the snapshot's zone maps exactly like
``layout.read_pruned`` — time travel costs nothing at scan time.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa


def _write_manifest(out_dir: str, version: int, man: dict) -> None:
    tmp = os.path.join(out_dir, f".v{version:04d}.tmp.json")
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, f"v{version:04d}.json"))
    ptr = os.path.join(out_dir, ".latest.tmp")
    with open(ptr, "w") as f:
        f.write(str(version))
    os.replace(ptr, os.path.join(out_dir, "_latest"))


def load_manifest(out_dir: str, version: int | None = None) -> dict:
    if version is None:
        with open(os.path.join(out_dir, "_latest")) as f:
            version = int(f.read().strip())
    with open(os.path.join(out_dir, f"v{version:04d}.json")) as f:
        man = json.load(f)
    man["version"] = version
    return man


def commit_initial(ds, col: str, out_dir: str,
                   num_partitions: int = 16) -> dict:
    """Version-1 commit: range-partition by int64 ``col`` (same pure
    bucket function as layout.write_clustered) into immutable
    ``part-{p}-v0001`` files + the v1 snapshot manifest."""
    from ray.data.aggregate import Max, Min

    stats = ds.aggregate(Min(col), Max(col))
    lo, hi = int(stats[f"min({col})"]), int(stats[f"max({col})"])
    width = max(1, (hi - lo + num_partitions) // num_partitions)
    os.makedirs(out_dir, exist_ok=True)

    def _tag(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy().astype(np.int64)
        return b.append_column(
            "_part", pa.array((v - lo) // width, pa.int64()))

    def _write(g: pd.DataFrame) -> pd.DataFrame:
        p = int(g["_part"].iloc[0])
        return _write_part(out_dir, col, g.drop(columns=["_part"]),
                           p, 1)

    zones = (ds.map_batches(_tag, batch_format="pyarrow")
             .groupby("_part").map_groups(_write, batch_format="pandas")
             .to_pandas())
    man = {"col": col, "lo": lo, "width": width,
           "partitions": sorted(zones.to_dict("records"),
                                key=lambda d: d["part"])}
    _write_manifest(out_dir, 1, man)
    return load_manifest(out_dir, 1)


def _write_part(out_dir: str, col: str, g: pd.DataFrame, p: int,
                version: int) -> pd.DataFrame:
    import pyarrow.parquet as pq

    if len(g) == 0:
        return pd.DataFrame({"part": pd.Series([], dtype=np.int64),
                             "file": pd.Series([], dtype=object),
                             "rows": pd.Series([], dtype=np.int64),
                             "min": pd.Series([], dtype=np.int64),
                             "max": pd.Series([], dtype=np.int64)})
    t = pa.Table.from_pandas(g, preserve_index=False)
    name = f"part-{p:05d}-v{version:04d}.parquet"
    tmp = os.path.join(out_dir, f".{name}.tmp")
    pq.write_table(t, tmp)
    os.replace(tmp, os.path.join(out_dir, name))
    v = g[col].to_numpy()
    return pd.DataFrame({"part": [p], "file": [name], "rows": [len(g)],
                         "min": [int(v.min())], "max": [int(v.max())]})


def commit_overwrite_partition(out_dir: str, part: int,
                               replacement_ds) -> dict:
    """Commit version N+1 replacing ONE partition's contents with
    ``replacement_ds`` (must stay within the partition's key range);
    every other partition's files are reused as-is."""
    man = load_manifest(out_dir)
    col = man["col"]
    new_version = man["version"] + 1

    def _write(g: pd.DataFrame) -> pd.DataFrame:
        return _write_part(out_dir, col, g, part, new_version)

    zones = (replacement_ds.repartition(1)
             .map_batches(_write, batch_format="pandas",
                          batch_size=None).to_pandas())
    lo_p = man["lo"] + part * man["width"]
    hi_p = lo_p + man["width"] - 1
    assert int(zones["min"].iloc[0]) >= lo_p \
        and int(zones["max"].iloc[0]) <= hi_p, \
        "replacement leaves the partition's key range"
    parts = [p for p in man["partitions"] if p["part"] != part]
    parts.extend(zones.to_dict("records"))
    new_man = {"col": col, "lo": man["lo"], "width": man["width"],
               "partitions": sorted(parts, key=lambda d: d["part"])}
    if "add_cols" in man:
        new_man["add_cols"] = man["add_cols"]
    _write_manifest(out_dir, new_version, new_man)
    return load_manifest(out_dir, new_version)


def read_version_pruned(out_dir: str, version: int, lo: int, hi: int):
    """Zone-map-pruned Dataset of rows with key in [lo, hi] AS OF the
    given snapshot. Returns (dataset | None, stats)."""
    import ray.data as rd

    man = load_manifest(out_dir, version)
    col = man["col"]
    hit = [p for p in man["partitions"]
           if p["min"] <= hi and p["max"] >= lo]
    stats = {"files_total": len(man["partitions"]),
             "files_read": len(hit),
             "rows_admitted": sum(p["rows"] for p in hit)}
    if not hit:
        return None, stats
    ds = rd.read_parquet([os.path.join(out_dir, p["file"]) for p in hit])
    add_cols = man.get("add_cols", {})

    def _residual(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy().astype(np.int64)
        b = b.filter(pa.array((v >= lo) & (v <= hi)))
        # merge-on-read schema fill: files predating an added column
        # surface it with the snapshot's default — whether the reader
        # omitted the column entirely or unified it in as nulls
        import pyarrow.compute as _pc

        for name, dflt in add_cols.items():
            if name not in b.column_names:
                b = b.append_column(
                    name, pa.array([dflt] * b.num_rows))
            else:
                i = b.column_names.index(name)
                b = b.set_column(
                    i, name, _pc.fill_null(b.column(name), dflt))
        return b

    return ds.map_batches(_residual, batch_format="pyarrow"), stats


def commit_add_column(out_dir: str, name: str, default) -> dict:
    """Schema evolution, version N+1: add a column with a default —
    a pure MANIFEST commit (zero data files written). Files written
    before the column existed are filled with the default at read
    time (merge-on-read), so historical snapshots keep their own
    schema and the new version sees the column everywhere."""
    man = load_manifest(out_dir)
    add = dict(man.get("add_cols", {}))
    if name in add:
        raise ValueError(f"column {name} already added")
    add[name] = default
    new_man = {k: man[k] for k in ("col", "lo", "width", "partitions")}
    new_man["add_cols"] = add
    _write_manifest(out_dir, man["version"] + 1, new_man)
    return load_manifest(out_dir, man["version"] + 1)


def commit_delete_range(out_dir: str, klo: int, khi: int) -> dict:
    """Row-level delete of key range [klo, khi] as version N+1:
    untouched partitions keep their files, fully-covered partitions
    simply leave the manifest (zero I/O), and only STRADDLING
    partitions (at most two for a contiguous range) are rewritten
    without the deleted rows — O(boundary data) write cost."""
    import ray.data as rd

    man = load_manifest(out_dir)
    col = man["col"]
    new_version = man["version"] + 1
    keep, rewrite = [], []
    for p in man["partitions"]:
        if p["max"] < klo or p["min"] > khi:
            keep.append(p)
        elif p["min"] >= klo and p["max"] <= khi:
            continue                       # fully deleted: drop
        else:
            rewrite.append(p)
    for p in rewrite:
        ds = rd.read_parquet(os.path.join(out_dir, p["file"]))

        def _drop(b: pa.Table) -> pa.Table:
            v = b.column(col).to_numpy().astype(np.int64)
            return b.filter(pa.array((v < klo) | (v > khi)))

        def _write(g: pd.DataFrame) -> pd.DataFrame:
            return _write_part(out_dir, col, g, int(p["part"]),
                               new_version)

        zones = (ds.map_batches(_drop, batch_format="pyarrow")
                 .repartition(1)
                 .map_batches(_write, batch_format="pandas",
                              batch_size=None).to_pandas())
        if len(zones) and int(zones["rows"].iloc[0]) > 0:
            keep.extend(zones.to_dict("records"))
    new_man = {"col": col, "lo": man["lo"], "width": man["width"],
               "partitions": sorted(keep, key=lambda d: d["part"])}
    if "add_cols" in man:
        new_man["add_cols"] = man["add_cols"]
    _write_manifest(out_dir, new_version, new_man)
    return load_manifest(out_dir, new_version)


def commit_upsert(out_dir: str, updates_ds) -> dict:
    """MERGE (upsert by key) as version N+1: update rows route to
    their partitions by the SAME pure bucket function, each AFFECTED
    partition is rewritten once by a distributed merge task that reads
    its old file and applies new-wins-by-key, and unaffected
    partitions keep their files. Keys beyond the original range simply
    create new partition ids — the bucket function is total, the
    manifest just grows. Write cost is O(touched partitions), the
    merge itself is fully distributed (one task per partition)."""
    man = load_manifest(out_dir)
    col = man["col"]
    lo, width = man["lo"], man["width"]
    new_version = man["version"] + 1
    old_files = {p["part"]: p["file"] for p in man["partitions"]}
    add_cols = man.get("add_cols", {})

    def _tag(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy().astype(np.int64)
        return b.append_column(
            "_part", pa.array((v - lo) // width, pa.int64()))

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        p = int(g["_part"].iloc[0])
        new = g.drop(columns=["_part"])
        assert new[col].is_unique, "duplicate keys in one upsert batch"
        if p in old_files:
            old = pq.read_table(
                os.path.join(out_dir, old_files[p])).to_pandas()
            for name, dflt in add_cols.items():
                if name not in old.columns:
                    old[name] = dflt
            old = old[~old[col].isin(new[col])]
            merged = pd.concat([old, new], ignore_index=True)
        else:
            merged = new
        merged = merged.sort_values(col, kind="stable") \
            .reset_index(drop=True)
        return _write_part(out_dir, col, merged, p, new_version)

    zones = (updates_ds.map_batches(_tag, batch_format="pyarrow")
             .groupby("_part").map_groups(_merge, batch_format="pandas")
             .to_pandas())
    touched = set(zones["part"].astype(int))
    parts = [p for p in man["partitions"] if p["part"] not in touched]
    parts.extend(zones.to_dict("records"))
    new_man = {"col": col, "lo": lo, "width": width,
               "partitions": sorted(parts, key=lambda d: d["part"])}
    if add_cols:
        new_man["add_cols"] = add_cols
    _write_manifest(out_dir, new_version, new_man)
    return load_manifest(out_dir, new_version)


def vacuum(out_dir: str, keep_versions: int = 2) -> dict:
    """Garbage-collect data files unreferenced by the retained
    snapshots (the newest ``keep_versions``), plus crash-orphaned tmp
    files. Retained manifests keep working verbatim; older manifests
    are removed with their exclusive files. Returns counts."""
    with open(os.path.join(out_dir, "_latest")) as f:
        latest = int(f.read().strip())
    keep = set(range(max(1, latest - keep_versions + 1), latest + 1))
    referenced = set()
    for v in keep:
        for p in load_manifest(out_dir, v)["partitions"]:
            referenced.add(p["file"])
    removed_files = removed_manifests = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if name.startswith("."):                  # crash leftovers
            os.remove(path)
            removed_files += 1
        elif name.endswith(".parquet") and name not in referenced:
            os.remove(path)
            removed_files += 1
        elif name.startswith("v") and name.endswith(".json") \
                and int(name[1:5]) not in keep:
            os.remove(path)
            removed_manifests += 1
    return {"kept_versions": sorted(keep),
            "removed_files": removed_files,
            "removed_manifests": removed_manifests}
