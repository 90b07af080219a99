"""S2-style region covering + Morton-range pruned scans.

The standard spatial-index idiom for "give me everything in this
region" over a cell-clustered table (BigQuery GIS, S2, H3 range
queries): descend the quad hierarchy to build a MIXED-RESOLUTION
covering of the query region, translate each covering cell into one
contiguous Morton-key range at the storage resolution, merge adjacent
ranges, and read only the clustered files whose zone maps overlap a
range — with the exact geometric predicate applied as an in-stream
residual refine.

Split of labor:
- the covering (``bbox_cover``) is a driver-side recursion over the
  QUERY geometry — output is O(perimeter * 2^res / world) cells,
  bounded by ``max_cells``, never corpus-sized;
- the scan (``read_pruned_ranges``) is zone-map file pruning against
  the layout manifest written by ``state.layout.write_clustered``,
  with a vectorized searchsorted residual over the merged range
  bounds (one binary search per row, no per-range pass).

SCALE: at 10^12 rows clustered into ~10^5 files, a city-sized bbox
touches the handful of files whose Morton spans intersect the cover
ranges; everything else is skipped by the manifest without opening a
footer. Cover size is controlled by ``max_cells`` exactly as S2's
RegionCoverer — a coarser cover reads slightly more rows, never
fewer files than necessary.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from .cells import _spread_bits


def morton_key(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Interleaved Morton key (no resolution bits) as int64."""
    m = _spread_bits(np.asarray(x, np.uint64)) | (
        _spread_bits(np.asarray(y, np.uint64)) << np.uint64(1))
    return m.astype(np.int64)


def bbox_cover(lat_lo: float, lat_hi: float, lon_lo: float,
               lon_hi: float, res: int,
               max_cells: int = 256) -> list[tuple[int, int, int]]:
    """Mixed-resolution quad covering of a lat/lon bbox: cells fully
    inside the bbox stop descending immediately; partial cells split
    until ``res`` (or until the cover would exceed ``max_cells``, at
    which point remaining partial cells are emitted coarse — a
    SUPERSET cover, like S2's max_cells knob)."""
    out: list[tuple[int, int, int]] = []
    frontier = [(0, 0, 0)]
    while frontier:
        nxt: list[tuple[int, int, int]] = []
        for r, x, y in frontier:
            n = float(1 << r)
            c_lon_lo = x / n * 360.0 - 180.0
            c_lon_hi = (x + 1) / n * 360.0 - 180.0
            c_lat_hi = 90.0 - y / n * 180.0
            c_lat_lo = 90.0 - (y + 1) / n * 180.0
            if (c_lon_hi <= lon_lo or c_lon_lo >= lon_hi
                    or c_lat_hi <= lat_lo or c_lat_lo >= lat_hi):
                continue
            inside = (c_lon_lo >= lon_lo and c_lon_hi <= lon_hi
                      and c_lat_lo >= lat_lo and c_lat_hi <= lat_hi)
            if inside or r == res:
                out.append((r, x, y))
            else:
                nxt.extend(((r + 1, 2 * x + dx, 2 * y + dy)
                            for dx in (0, 1) for dy in (0, 1)))
        if len(out) + len(nxt) > max_cells:
            out.extend(nxt)   # emit coarse: still a superset cover
            break
        frontier = nxt
    return out


def cover_to_ranges(cover: list[tuple[int, int, int]],
                    res: int) -> list[tuple[int, int]]:
    """Each covering cell at resolution r owns one contiguous Morton
    range at storage resolution ``res``; sort and merge adjacency."""
    raw = []
    for r, x, y in cover:
        m = int(morton_key(np.array([x], np.uint64),
                           np.array([y], np.uint64))[0])
        shift = 2 * (res - r)
        raw.append((m << shift, ((m + 1) << shift) - 1))
    raw.sort()
    merged: list[list[int]] = []
    for lo, hi in raw:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    return [(lo, hi) for lo, hi in merged]


def read_pruned_ranges(out_dir: str, ranges: list[tuple[int, int]]):
    """Multi-range zone-map scan over a ``write_clustered`` layout:
    files whose [min, max] intersects ANY range are read; the residual
    keeps rows inside some range via one searchsorted per row.
    Returns (dataset_or_None, stats)."""
    import ray.data as rd

    with open(os.path.join(out_dir, "_manifest.json")) as f:
        man = json.load(f)
    col = man["col"]
    hit = [p for p in man["partitions"]
           if any(p["min"] <= hi and p["max"] >= lo
                  for lo, hi in ranges)]
    stats = {"files_total": len(man["partitions"]),
             "files_read": len(hit),
             "rows_admitted": sum(p["rows"] for p in hit)}
    if not hit or not ranges:
        return None, stats

    starts = np.array([lo for lo, _ in ranges], np.int64)
    ends = np.array([hi for _, hi in ranges], np.int64)

    ds = rd.read_parquet([os.path.join(out_dir, p["file"]) for p in hit])

    def _residual(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy().astype(np.int64)
        idx = np.searchsorted(starts, v, side="right") - 1
        ok = (idx >= 0) & (v <= ends[np.clip(idx, 0, len(ends) - 1)])
        return b.filter(pa.array(ok))

    return ds.map_batches(_residual, batch_format="pyarrow"), stats
