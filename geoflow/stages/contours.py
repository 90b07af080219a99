"""Marching-squares contour extraction over the tiled raster table.

Mid-edge variant: each 2x2 pixel block (a "cell", top-left corner at
pixel (y, x)) is classified by which corners sit >= the level; crossed
edges get a vertex at the edge MIDPOINT, encoded in doubled integer
coordinates (2*x+1, 2*y) etc. — all-integer, so the extraction is
exact and bit-replayable in SQL (no interpolation float drift).

Distribution shape: the tile table's 1-px DEM halo already carries
every neighbor pixel a cell can touch, so extraction is ONE stateless
``map_batches`` — no tile join, no shuffle. Cell ownership is
unambiguous (the tile containing the cell's top-left pixel owns it),
and cells whose +1 row/col would leave the raster are skipped (the
halo is extrapolated there, not data). Tiled output == full-raster
output bit-for-bit (pytest), and the segment set satisfies the
marching-squares topology invariant: every crossed edge midpoint has
degree 2 (interior) or 1 (raster boundary), i.e. contours are closed
loops or boundary-to-boundary paths.

Saddle convention (cases 5/10, both diagonals inside): each inside
corner keeps its own segment (separate-blobs resolution), identically
in the engine table and the SQL VALUES twin.

Reference anchor: the reference's raster family derives per-pixel
products (slope/aspect, geoflow.stages.terrain); contouring is the
classic vector-from-raster sibling (gdal_contour) re-expressed on the
same tile schema.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# corners: 0=tl, 1=tr, 2=br, 3=bl; edges: 0=top(tl,tr), 1=right(tr,br),
# 2=bottom(br,bl), 3=left(bl,tl)
_EDGE_CORNERS = [(0, 1), (1, 2), (2, 3), (3, 0)]
# edge midpoint offsets from the cell's top-left pixel, DOUBLED coords
EDGE_DX2 = np.array([1, 2, 1, 0], dtype=np.int64)
EDGE_DY2 = np.array([0, 1, 2, 1], dtype=np.int64)


def _case_segments(c: int) -> list[tuple[int, int]]:
    inside = [(c >> k) & 1 for k in range(4)]
    crossed = [e for e, (a, b) in enumerate(_EDGE_CORNERS)
               if inside[a] != inside[b]]
    if not crossed:
        return []
    if len(crossed) == 2:
        return [tuple(crossed)]
    # saddles: each inside corner takes its two adjacent edges
    if c == 0b0101:                       # tl + br inside
        return [(0, 3), (1, 2)]
    return [(0, 1), (2, 3)]               # tr + bl inside


CASE_SEGMENTS = [_case_segments(c) for c in range(16)]
# dense lookup: segment slot k in {0,1}; -1 = no segment
_SEG_A = np.full((16, 2), -1, dtype=np.int64)
_SEG_B = np.full((16, 2), -1, dtype=np.int64)
for _c, _segs in enumerate(CASE_SEGMENTS):
    for _k, (_a, _b) in enumerate(_segs):
        _SEG_A[_c, _k] = _a
        _SEG_B[_c, _k] = _b


def segments_from_grid(p: np.ndarray, levels: list[int], y0: int, x0: int,
                       h: int, w: int, height: int, width: int) -> dict:
    """Segments of the h x w cells owned by a tile whose 1-px-padded
    grid is ``p`` ((h+2, w+2)); (y0, x0) is the tile origin in the
    full (height, width) raster. Returns column dict (doubled global
    coords)."""
    out = {"level": [], "x1": [], "y1": [], "x2": [], "y2": []}
    gy = y0 + np.arange(h)
    gx = x0 + np.arange(w)
    valid = (gy[:, None] <= height - 2) & (gx[None, :] <= width - 2)
    for lv in levels:
        ge = p >= lv
        case = (ge[1:1 + h, 1:1 + w] * 1 + ge[1:1 + h, 2:2 + w] * 2
                + ge[2:2 + h, 2:2 + w] * 4 + ge[2:2 + h, 1:1 + w] * 8)
        for k in (0, 1):
            a = _SEG_A[case, k]
            m = valid & (a >= 0)
            if not m.any():
                continue
            iy, ix = np.nonzero(m)
            ea = a[iy, ix]
            eb = _SEG_B[case, k][iy, ix]
            cx2 = 2 * (x0 + ix)
            cy2 = 2 * (y0 + iy)
            out["level"].append(np.full(len(iy), lv, dtype=np.int64))
            out["x1"].append(cx2 + EDGE_DX2[ea])
            out["y1"].append(cy2 + EDGE_DY2[ea])
            out["x2"].append(cx2 + EDGE_DX2[eb])
            out["y2"].append(cy2 + EDGE_DY2[eb])
    return {k: (np.concatenate(v) if v else np.array([], dtype=np.int64))
            for k, v in out.items()}


def contour_segments(tiles_ds, levels: list[int], height: int, width: int,
                     tile: int):
    """Dataset of (level, x1, y1, x2, y2) contour segments (doubled
    integer coordinates) — one stateless pass over the tile table."""

    def _f(b: pa.Table) -> pa.Table:
        from .terrain import _rows_as_arrays

        hs = b.column("height").to_numpy()
        ws = b.column("width").to_numpy()
        tys = b.column("tile_y").to_numpy()
        txs = b.column("tile_x").to_numpy()
        halos = _rows_as_arrays(b.column("dem_halo"))
        cols = {k: [] for k in ("level", "x1", "y1", "x2", "y2")}
        for i in range(len(hs)):
            h, w = int(hs[i]), int(ws[i])
            p = halos[i].reshape(h + 2, w + 2)
            seg = segments_from_grid(p, levels, int(tys[i]) * tile,
                                     int(txs[i]) * tile, h, w,
                                     height, width)
            for k in cols:
                cols[k].append(seg[k])
        return pa.table({k: pa.array(np.concatenate(v), pa.int64())
                         for k, v in cols.items()})

    return tiles_ds.map_batches(_f, batch_format="pyarrow")


def contour_case_sql_values() -> str:
    """The engine's case table as a SQL VALUES relation
    seg(cse, ax2, ay2, bx2, by2) — shared verbatim with the oracle."""
    rows = []
    for c, segs in enumerate(CASE_SEGMENTS):
        for a, b in segs:
            rows.append(f"({c}, {EDGE_DX2[a]}, {EDGE_DY2[a]},"
                        f" {EDGE_DX2[b]}, {EDGE_DY2[b]})")
    return ("seg(cse, ax2, ay2, bx2, by2) AS (VALUES "
            + ", ".join(rows) + ")")
