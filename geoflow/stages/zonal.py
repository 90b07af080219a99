"""Raster <-> vector zonal aggregation keyed on quadtree cells.

North-rule operator: "raster<->vector zonal aggregation done as
groupby-aggregate shuffles keyed on H3 cell". Generalizes the
reference's two zonal patterns — the classification-map group masking
(``eval.py:128-141``) and the rose-diagram binned means
(``rose_diagram_eval.py:197-233``) — from ad-hoc integer maps to the
hierarchical cell grid shared with the web-page side, so raster pixels
and geocoded pages aggregate under the SAME keys and can be joined
cell-to-cell afterwards.

Shape: each tile knows its georeference (affine lat/lon of pixel (0,0)
of the raster + per-pixel steps); a stateless ``map_batches`` computes
per-pixel cell ids and collapses them to per-(band, cell) partials
WITHIN the tile (pixels of one tile span only a handful of coarse
cells), so the groupby shuffle moves O(tiles x cells-per-tile) rows,
not O(pixels).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Max, Min, Sum

from . import cells as cellmod
from .terrain import _rows_as_arrays


@dataclass(frozen=True)
class RasterGeo:
    """Affine georeference: pixel (row, col) of the FULL raster ->
    (lat, lon) of the pixel center."""

    lat0: float = 70.0          # latitude of row 0 center
    lon0: float = -170.0        # longitude of col 0 center
    dlat: float = -0.01         # latitude step per row (southward)
    dlon: float = 0.01          # longitude step per col

    def pixel_lonlat(self, row0: int, col0: int, h: int, w: int):
        rows = self.lat0 + (row0 + np.arange(h)) * self.dlat
        cols = self.lon0 + (col0 + np.arange(w)) * self.dlon
        lat = np.repeat(rows, w)
        lon = np.tile(cols, h)
        return lat, lon


def zonal_partials_batch(batch: pa.Table, geo: RasterGeo, res: int,
                         tile_size: int,
                         value_col: str = "pixels") -> pa.Table:
    """Tile rows -> per-(band, cell) partial sums within the batch."""
    bands = batch.column("band").to_numpy()
    tys = batch.column("tile_y").to_numpy()
    txs = batch.column("tile_x").to_numpy()
    hs = batch.column("height").to_numpy()
    ws = batch.column("width").to_numpy()
    vals = _rows_as_arrays(batch.column(value_col))
    acc: dict[tuple, np.ndarray] = {}
    for b, ty, tx, h, w, v in zip(bands, tys, txs, hs, ws, vals):
        lat, lon = geo.pixel_lonlat(ty * tile_size, tx * tile_size, h, w)
        cell = cellmod.cell_id(lat, lon, res).astype(np.int64)
        v64 = v.astype(np.float64)
        order = np.argsort(cell, kind="stable")
        cs, vs = cell[order], v64[order]
        bounds = np.flatnonzero(np.diff(cs)) + 1
        for seg_c, seg_v in zip(np.split(cs, bounds), np.split(vs, bounds)):
            key = (int(b), int(seg_c[0]))
            part = np.array([seg_v.sum(), len(seg_v),
                             seg_v.min(), seg_v.max()])
            cur = acc.get(key)
            if cur is None:
                acc[key] = part
            else:
                cur[0] += part[0]
                cur[1] += part[1]
                cur[2] = min(cur[2], part[2])
                cur[3] = max(cur[3], part[3])
    ks = list(acc)
    st = np.vstack(list(acc.values())) if acc else np.empty((0, 4))
    return pa.table({
        "band": pa.array([k[0] for k in ks], pa.int32()),
        "cell": pa.array([k[1] for k in ks], pa.int64()),
        "value_sum": pa.array(st[:, 0], pa.float64()),
        "_n": pa.array(st[:, 1].astype(np.int64), pa.int64()),
        "value_min": pa.array(st[:, 2], pa.float64()),
        "value_max": pa.array(st[:, 3], pa.float64()),
    })


def raster_zonal_stats(tiles_ds, geo: RasterGeo = RasterGeo(), res: int = 6,
                       tile_size: int = 64, value_col: str = "pixels"):
    """-> Dataset (band, cell, n_pixels, mean_value, min, max)."""
    partials = tiles_ds.map_batches(
        lambda b: zonal_partials_batch(b, geo, res, tile_size, value_col),
        batch_format="pyarrow")
    agg = partials.groupby(["band", "cell"]).aggregate(
        Sum("value_sum", alias_name="value_sum"),
        Sum("_n", alias_name="n_pixels"),
        Min("value_min", alias_name="value_min"),
        Max("value_max", alias_name="value_max"))

    def _mean(b: pa.Table) -> pa.Table:
        mean = b.column("value_sum").to_numpy() / b.column("n_pixels").to_numpy()
        return b.append_column("mean_value", pa.array(mean, pa.float64()))

    return agg.map_batches(_mean, batch_format="pyarrow")


def join_zonal_with_pages(raster_zonal_df: pd.DataFrame,
                          page_zonal_df: pd.DataFrame,
                          raster_res: int, page_res: int) -> pd.DataFrame:
    """Cell-to-cell join of raster zonal stats with page zonal stats.

    Aligns the two sides at the coarser of the two resolutions via
    quadtree parent arithmetic — the raster<->vector bridge.
    """
    res = min(raster_res, page_res)
    r = raster_zonal_df.copy()
    p = page_zonal_df.copy()
    r["join_cell"] = cellmod.cell_parent(
        r["cell"].to_numpy().astype(np.uint64), res).astype(np.int64)
    p["join_cell"] = cellmod.cell_parent(
        p["zone"].to_numpy().astype(np.uint64), res).astype(np.int64)
    return r.merge(p, on="join_cell", how="inner",
                   suffixes=("_raster", "_pages"))
