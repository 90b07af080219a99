"""Versioned layout: snapshot isolation, crash safety, pruning."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from geoflow.state.timetravel import (commit_initial,
                                      commit_overwrite_partition,
                                      load_manifest, read_version_pruned)


@pytest.fixture()
def table(tmp_path, ray_session):
    import ray.data as rd

    df = pd.DataFrame({"event_id": np.arange(160, dtype=np.int64),
                       "value": np.arange(160, dtype=np.float64)})
    d = str(tmp_path / "tt")
    man = commit_initial(rd.from_pandas(df), "event_id", d,
                         num_partitions=16)
    return d, df, man


def test_snapshot_isolation(table, ray_session):
    import ray.data as rd

    d, df, man = table
    lo, w = man["lo"], man["width"]
    sub, _ = read_version_pruned(d, 1, lo + 3 * w, lo + 4 * w - 1)

    import pyarrow as pa

    def _neg(b: pa.Table) -> pa.Table:
        return pa.table({"event_id": b.column("event_id"),
                         "value": pa.array(
                             -b.column("value").to_numpy())})

    man2 = commit_overwrite_partition(
        d, 3, sub.map_batches(_neg, batch_format="pyarrow"))
    assert man2["version"] == 2

    full1, _ = read_version_pruned(d, 1, 0, 10**9)
    got1 = full1.to_pandas().sort_values("event_id")
    assert (got1["value"].to_numpy()
            == df["value"].to_numpy()).all()        # v1 untouched
    full2, _ = read_version_pruned(d, 2, 0, 10**9)
    got2 = full2.to_pandas().sort_values("event_id")
    want = df["value"].to_numpy().copy()
    p3 = (df["event_id"] >= lo + 3 * w) & (df["event_id"] < lo + 4 * w)
    want[p3.to_numpy()] *= -1
    assert (got2["value"].to_numpy() == want).all()
    # v2 reuses every other partition's v1 file
    f1 = {p["file"] for p in load_manifest(d, 1)["partitions"]}
    f2 = {p["file"] for p in man2["partitions"]}
    assert len(f1 - f2) == 1 and len(f2 - f1) == 1


def test_pruning_and_range_guard(table, ray_session):
    d, df, man = table
    lo, w = man["lo"], man["width"]
    ds, st = read_version_pruned(d, 1, lo + 5 * w, lo + 6 * w - 1)
    assert st["files_read"] == 1 and st["files_total"] == 16
    assert ds.count() == w
    none, st0 = read_version_pruned(d, 1, 10**8, 10**9)
    assert none is None and st0["files_read"] == 0


def test_out_of_range_replacement_rejected(table, ray_session):
    import ray.data as rd

    d, df, man = table
    bad = rd.from_pandas(pd.DataFrame(
        {"event_id": np.array([0], np.int64),
         "value": np.array([1.0])}))
    with pytest.raises(Exception):
        commit_overwrite_partition(d, 3, bad)
    # the failed commit must not have become visible
    assert load_manifest(d)["version"] == 1


def test_torn_manifest_never_visible(table):
    d, _, man = table
    # simulate a crash: orphan data file + tmp manifest exist, but the
    # _latest pointer was never flipped
    open(os.path.join(d, "part-00003-v0099.parquet"), "wb").close()
    with open(os.path.join(d, ".v0099.tmp.json"), "w") as f:
        json.dump({}, f)
    assert load_manifest(d)["version"] == 1


def test_schema_evolution_merge_on_read(table, ray_session):
    import pyarrow as pa

    from geoflow.state.timetravel import commit_add_column

    d, df, man = table
    lo, w = man["lo"], man["width"]
    man2 = commit_add_column(d, "weight", 100)
    assert man2["version"] == 2
    # pure manifest commit: no new data files
    assert ({p["file"] for p in man2["partitions"]}
            == {p["file"] for p in load_manifest(d, 1)["partitions"]})
    # v1 keeps its original schema; v2 fills the default everywhere
    v1, _ = read_version_pruned(d, 1, 0, 10**9)
    assert "weight" not in v1.schema().names
    v2, _ = read_version_pruned(d, 2, 0, 10**9)
    got = v2.to_pandas()
    assert (got["weight"] == 100).all() and len(got) == len(df)

    # overwrite one partition with explicit weights at v3
    sub, _ = read_version_pruned(d, 2, lo + 3 * w, lo + 4 * w - 1)

    def _w7(b: pa.Table) -> pa.Table:
        import numpy as _np
        return pa.table({
            "event_id": b.column("event_id"),
            "value": b.column("value"),
            "weight": pa.array(_np.full(b.num_rows, 7, _np.int64))})

    commit_overwrite_partition(
        d, 3, sub.map_batches(_w7, batch_format="pyarrow"))
    v3, _ = read_version_pruned(d, 3, 0, 10**9)
    g3 = v3.to_pandas().sort_values("event_id")
    in_p3 = ((g3["event_id"] >= lo + 3 * w)
             & (g3["event_id"] < lo + 4 * w)).to_numpy()
    assert (g3["weight"].to_numpy()[in_p3] == 7).all()
    assert (g3["weight"].to_numpy()[~in_p3] == 100).all()
    # duplicate add is rejected
    with pytest.raises(ValueError):
        commit_add_column(d, "weight", 1)


def test_delete_range_three_cases(table, ray_session):
    from geoflow.state.timetravel import commit_delete_range

    d, df, man = table
    lo, w = man["lo"], man["width"]
    dlo, dhi = lo + 3 * w + w // 3, lo + 5 * w + w // 2
    man2 = commit_delete_range(d, dlo, dhi)
    # partition 4 fully covered -> dropped; 3 and 5 rewritten
    parts2 = {p["part"] for p in man2["partitions"]}
    assert 4 not in parts2 and {3, 5} <= parts2
    files1 = {p["part"]: p["file"] for p in man["partitions"]}
    files2 = {p["part"]: p["file"] for p in man2["partitions"]}
    assert files2[3] != files1[3] and files2[5] != files1[5]
    assert files2[0] == files1[0]          # untouched reuse
    # contents: exactly the range is gone at v2, v1 intact
    v2, _ = read_version_pruned(d, 2, 0, 10**9)
    got = set(v2.to_pandas()["event_id"])
    want = {int(i) for i in df["event_id"] if i < dlo or i > dhi}
    assert got == want
    v1, _ = read_version_pruned(d, 1, 0, 10**9)
    assert len(v1.to_pandas()) == len(df)


def test_delete_range_empties_straddler(tmp_path, ray_session):
    """A straddling partition whose survivors are zero rows must drop
    from the manifest, not write an empty file entry."""
    import ray.data as rd

    from geoflow.state.timetravel import (commit_delete_range,
                                          commit_initial)

    df = pd.DataFrame({"event_id": np.arange(32, dtype=np.int64),
                       "value": np.zeros(32)})
    d = str(tmp_path / "tt2")
    man = commit_initial(rd.from_pandas(df), "event_id", d,
                         num_partitions=16)
    w = man["width"]
    # delete everything from mid-partition-1 to the end
    man2 = commit_delete_range(d, w + 1, 10**9)
    parts = {p["part"] for p in man2["partitions"]}
    assert parts == {0, 1}
    v2, _ = read_version_pruned(d, 2, 0, 10**9)
    assert sorted(v2.to_pandas()["event_id"]) == list(range(w + 1))


def test_upsert_merge_semantics(table, ray_session):
    import pyarrow as pa
    import ray.data as rd

    from geoflow.state.timetravel import commit_upsert

    d, df, man = table
    # update keys 10..14 (one partition), insert 200..202 (new parts)
    ups = pd.DataFrame({
        "event_id": np.array([10, 11, 12, 13, 14, 200, 201, 202],
                             np.int64),
        "value": np.array([-1.0, -2, -3, -4, -5, 9.5, 9.6, 9.7])})
    man2 = commit_upsert(d, rd.from_pandas(ups))
    assert man2["version"] == 2
    # untouched partitions reuse v1 files
    f1 = {p["part"]: p["file"] for p in man["partitions"]}
    f2 = {p["part"]: p["file"] for p in man2["partitions"]}
    assert f2[0] == f1[0] and f2[1] != f1[1]
    assert max(f2) > max(f1)            # inserts grew the manifest
    v2, _ = read_version_pruned(d, 2, 0, 10**9)
    g = v2.to_pandas().set_index("event_id")["value"]
    assert g.loc[10] == -1.0 and g.loc[14] == -5.0
    assert g.loc[15] == 15.0            # neighbor in same part kept
    assert g.loc[200] == 9.5 and len(g) == len(df) + 3
    # v1 untouched
    v1, _ = read_version_pruned(d, 1, 0, 10**9)
    g1 = v1.to_pandas().set_index("event_id")["value"]
    assert g1.loc[10] == 10.0 and len(g1) == len(df)
    # duplicate keys in one upsert are rejected loudly
    bad = rd.from_pandas(pd.DataFrame(
        {"event_id": np.array([7, 7], np.int64),
         "value": np.array([1.0, 2.0])}))
    with pytest.raises(Exception):
        commit_upsert(d, bad)


def test_vacuum_keeps_retained_versions_working(table, ray_session):
    import pyarrow as pa

    from geoflow.state.timetravel import vacuum

    d, df, man = table
    lo, w = man["lo"], man["width"]
    sub, _ = read_version_pruned(d, 1, lo + 3 * w, lo + 4 * w - 1)

    def _z(b: pa.Table) -> pa.Table:
        import numpy as _np
        return pa.table({"event_id": b.column("event_id"),
                         "value": pa.array(
                             _np.zeros(b.num_rows))})

    commit_overwrite_partition(
        d, 3, sub.map_batches(_z, batch_format="pyarrow"))   # v2
    sub2, _ = read_version_pruned(d, 2, lo + 5 * w, lo + 6 * w - 1)
    commit_overwrite_partition(
        d, 5, sub2.map_batches(_z, batch_format="pyarrow"))  # v3
    # orphan from a simulated crash
    open(os.path.join(d, ".part-junk.tmp"), "wb").close()

    res = vacuum(d, keep_versions=2)
    assert res["kept_versions"] == [2, 3]
    assert res["removed_manifests"] == 1          # v1 gone
    # v1's exclusive file (part 3 @ v1) and the orphan were removed,
    # but v2 and v3 still read perfectly
    assert res["removed_files"] >= 2
    for v in (2, 3):
        ds, _ = read_version_pruned(d, v, 0, 10**9)
        assert ds.count() == len(df)
    with pytest.raises(FileNotFoundError):
        load_manifest(d, 1)
