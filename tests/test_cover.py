"""Region cover + Morton-range pruned scan: completeness, merging,
end-to-end pruning."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from geoflow.stages.cells import lonlat_to_xy
from geoflow.stages.cover import (bbox_cover, cover_to_ranges, morton_key,
                                  read_pruned_ranges)
from geoflow.state.layout import write_clustered


def _in_ranges(mk: np.ndarray, ranges) -> np.ndarray:
    starts = np.array([lo for lo, _ in ranges], np.int64)
    ends = np.array([hi for _, hi in ranges], np.int64)
    idx = np.searchsorted(starts, mk, side="right") - 1
    return (idx >= 0) & (mk <= ends[np.clip(idx, 0, len(ends) - 1)])


def test_cover_is_complete_and_ranges_disjoint():
    RES = 12
    bb = (40.45, 40.95, -74.25, -73.75)
    ranges = cover_to_ranges(bbox_cover(*bb, RES), RES)
    for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
        assert h1 + 1 < l2, "ranges must be merged and disjoint"
    rng = np.random.default_rng(3)
    lat = rng.uniform(bb[0] - 0.3, bb[1] + 0.3, 20000)
    lon = rng.uniform(bb[2] - 0.3, bb[3] + 0.3, 20000)
    x, y = lonlat_to_xy(lat, lon, RES)
    inr = _in_ranges(morton_key(x, y), ranges)
    inbb = (lat > bb[0]) & (lat < bb[1]) & (lon > bb[2]) & (lon < bb[3])
    assert not (inbb & ~inr).any(), "cover missed in-bbox points"


def test_cover_max_cells_stays_superset():
    RES = 14
    bb = (10.0, 12.0, 20.0, 23.0)
    tight = cover_to_ranges(bbox_cover(*bb, RES, max_cells=4096), RES)
    coarse = cover_to_ranges(bbox_cover(*bb, RES, max_cells=8), RES)
    rng = np.random.default_rng(5)
    lat = rng.uniform(bb[0], bb[1], 5000)
    lon = rng.uniform(bb[2], bb[3], 5000)
    x, y = lonlat_to_xy(lat, lon, RES)
    mk = morton_key(x, y)
    assert _in_ranges(mk, tight).all()
    assert _in_ranges(mk, coarse).all()   # coarse cover still complete


def test_read_pruned_ranges_end_to_end(tmp_path):
    RES = 10
    rng = np.random.default_rng(11)
    lat = rng.uniform(-60, 70, 3000)
    lon = rng.uniform(-180, 180, 3000)
    x, y = lonlat_to_xy(lat, lon, RES)
    mk = morton_key(x, y)
    ids = np.arange(3000, dtype=np.int64)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids), "lat": pa.array(lat),
        "lon": pa.array(lon), "mkey": pa.array(mk)})).repartition(4)
    out_dir = str(tmp_path / "clustered")
    write_clustered(ds, "mkey", out_dir, num_partitions=16)

    bb = (0.0, 30.0, 0.0, 40.0)
    ranges = cover_to_ranges(bbox_cover(*bb, RES), RES)
    got, stats = read_pruned_ranges(out_dir, ranges)
    assert stats["files_read"] < stats["files_total"]
    df = got.to_pandas()
    inr = set(df["doc_id"])
    inbb = (lat > bb[0]) & (lat < bb[1]) & (lon > bb[2]) & (lon < bb[3])
    assert set(ids[inbb]).issubset(inr), "pruned scan lost bbox rows"
    # every admitted row really is inside some cover range
    assert _in_ranges(df["mkey"].to_numpy(np.int64), ranges).all()


def test_read_pruned_ranges_empty_intersection(tmp_path):
    ds = rd.from_arrow(pa.table({
        "mkey": pa.array(np.arange(100, dtype=np.int64)),
        "v": pa.array(np.arange(100, dtype=np.int64))}))
    out_dir = str(tmp_path / "c2")
    write_clustered(ds, "mkey", out_dir, num_partitions=4)
    got, stats = read_pruned_ranges(out_dir, [(10_000, 20_000)])
    assert got is None and stats["files_read"] == 0
