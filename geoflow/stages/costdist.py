"""Cost-distance (least-cost-path distance map) over the tiled raster.

GIS cost-surface accumulation (gdal-style cost distance, 4-connected,
integer semantics): dist(cell) = min over paths from any source of the
sum of ENTERED cells' costs (dist(source) = 0). Integer costs make
every distance exact — no float drift, ties cannot reorder results.

Distributed shape: synchronous label-correcting rounds (the classic
distributed Bellman-Ford / delta-stepping family):

1. every tile relaxes to its LOCAL fixpoint with a vectorized
   4-shift ``np.minimum`` sweep (equivalent to in-tile Dijkstra,
   no per-cell Python);
2. tiles exchange 1-px boundary strips with their 4 neighbors — one
   bucket-keyed groupby per round, strips only (O(perimeter) bytes,
   never tile bodies ... the body rides with its OWN tile key);
3. repeat until no tile improves. Round count is bounded by the max
   number of tile boundaries a shortest path crosses (<= grid
   diameter / tile side — at 100 TB pick tiles so this stays tens,
   the standard block-parallel sweep bound).

Verification: the query's oracle is a GOLDEN VALUES table produced by
an INDEPENDENT driver-side heapq Dijkstra (oracle-style, different
algorithm + different traversal order), so a hash match is a real
algorithmic check, not a transcription.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

INF = np.int64(1) << np.int64(62)


def local_relax(dist: np.ndarray, cost: np.ndarray,
                halo: np.ndarray) -> tuple[np.ndarray, bool]:
    """Relax one tile to its local fixpoint. ``dist``/(h,w) current
    estimates, ``cost``/(h,w) entry costs, ``halo``/(h+2,w+2) with the
    neighbor-tile boundary estimates on the ring (INF where absent).
    Returns (new dist, improved_anything)."""
    h, w = dist.shape
    p = halo.copy()
    p[1:h + 1, 1:w + 1] = dist
    improved = False
    while True:
        cand = np.minimum(
            np.minimum(p[0:h, 1:w + 1], p[2:h + 2, 1:w + 1]),
            np.minimum(p[1:h + 1, 0:w], p[1:h + 1, 2:w + 2]))
        # saturating add keeps INF + cost from wrapping
        cand = np.where(cand >= INF, INF, cand + cost)
        nd = np.minimum(p[1:h + 1, 1:w + 1], cand)
        if (nd == p[1:h + 1, 1:w + 1]).all():
            break
        p[1:h + 1, 1:w + 1] = nd
        improved = True
    return p[1:h + 1, 1:w + 1], improved


def cost_distance_tiles(dem: np.ndarray, sources: list[tuple[int, int]],
                        tile: int):
    """Distributed cost-distance over ``dem`` (cost = dem value,
    4-connected, enter-cost semantics). Returns the full distance map
    (driver-assembled for verification; web-scale callers keep the
    per-tile dataset). Runs synchronous halo-exchange rounds on a Ray
    Dataset of tile rows until global fixpoint."""
    import ray.data as rd

    H, W = dem.shape
    # driver-assembly guard: the final `full` map materializes H*W
    # int64 cells on the driver — this entry point is for
    # verification-sized rasters only (web-scale callers keep the
    # per-tile dataset and write it partitioned instead)
    if H * W > 64_000_000:
        raise ValueError(
            f"cost_distance_tiles assembles the full {H}x{W} raster on "
            "the driver and is intended for verification-sized inputs "
            "(<= 64M cells); keep the tile dataset distributed at scale")
    rows = []
    for ty in range(0, H, tile):
        for tx in range(0, W, tile):
            h = min(tile, H - ty)
            w = min(tile, W - tx)
            d = np.full((h, w), INF, dtype=np.int64)
            for sy, sx in sources:
                if ty <= sy < ty + h and tx <= sx < tx + w:
                    d[sy - ty, sx - tx] = 0
            rows.append({
                "ty": ty // tile, "tx": tx // tile, "h": h, "w": w,
                "kind": 0, "side": -1,
                "dist": d.ravel().tolist(),
                "cost": dem[ty:ty + h, tx:tx + w].ravel()
                .astype(np.int64).tolist()})
    # one block per tile row-item: from_items' default parallelism would
    # pad short lists with empty untyped blocks
    ds = rd.from_items(rows, override_num_blocks=max(1, len(rows)))
    nty = (H + tile - 1) // tile
    ntx = (W + tile - 1) // tile

    def _emit(b: pa.Table) -> pa.Table:
        out = []
        for r in b.to_pylist():
            out.append(r)
            if r["kind"] != 0:
                continue
            h, w = r["h"], r["w"]
            d = np.asarray(r["dist"], dtype=np.int64).reshape(h, w)
            # strips go to the 4 neighbors, keyed by the NEIGHBOR tile;
            # side encodes which ring row/col of the receiver they fill
            for side, (dy, dx, strip) in enumerate([
                    (-1, 0, d[0, :]), (1, 0, d[-1, :]),
                    (0, -1, d[:, 0]), (0, 1, d[:, -1])]):
                ny, nx = r["ty"] + dy, r["tx"] + dx
                if 0 <= ny < nty and 0 <= nx < ntx:
                    out.append({
                        "ty": ny, "tx": nx, "h": h, "w": w,
                        "kind": 1, "side": side,
                        "dist": strip.tolist(), "cost": []})
        return pa.Table.from_pylist(out, schema=b.schema)

    def _relax(g: pd.DataFrame) -> pd.DataFrame:
        body = g[g["kind"] == 0].iloc[0]
        h, w = int(body["h"]), int(body["w"])
        dist = np.asarray(body["dist"], dtype=np.int64).reshape(h, w)
        cost = np.asarray(body["cost"], dtype=np.int64).reshape(h, w)
        halo = np.full((h + 2, w + 2), INF, dtype=np.int64)
        for s in g[g["kind"] == 1].itertuples(index=False):
            strip = np.asarray(s.dist, dtype=np.int64)
            if s.side == 0:    # sender is my SOUTH neighbor's top? no:
                # side was taken from the SENDER's perspective:
                # side 0 = sender's top row -> sender sits BELOW me,
                # so it fills MY bottom halo row
                halo[h + 1, 1:1 + len(strip)] = np.minimum(
                    halo[h + 1, 1:1 + len(strip)], strip)
            elif s.side == 1:  # sender's bottom row -> fills my top
                halo[0, 1:1 + len(strip)] = np.minimum(
                    halo[0, 1:1 + len(strip)], strip)
            elif s.side == 2:  # sender's left col -> fills my right
                halo[1:1 + len(strip), w + 1] = np.minimum(
                    halo[1:1 + len(strip), w + 1], strip)
            else:              # sender's right col -> fills my left
                halo[1:1 + len(strip), 0] = np.minimum(
                    halo[1:1 + len(strip), 0], strip)
        nd, improved = local_relax(dist, cost, halo)
        return pd.DataFrame([{
            "ty": int(body["ty"]), "tx": int(body["tx"]),
            "h": h, "w": w, "kind": 0, "side": -1,
            "dist": nd.ravel().tolist(),
            "cost": cost.ravel().tolist(),
            "changed": bool(improved)}])

    # round 0 must at least seed sources, so loop with a did-change flag
    while True:
        def _key(b: pa.Table) -> pa.Table:
            k = (np.asarray(b.column("ty")) * 4096
                 + np.asarray(b.column("tx"))).astype(np.int64)
            return b.append_column("_k", pa.array(k, pa.int64()))

        nxt = (ds.map_batches(_emit, batch_format="pyarrow")
               .map_batches(_key, batch_format="pyarrow")
               .groupby("_k").map_groups(_relax, batch_format="pandas")
               .materialize())
        changed = nxt.map_batches(
            lambda b: pa.table({"c": pa.array(
                [int(np.asarray(b.column("changed")).sum())],
                pa.int64())}), batch_format="pyarrow").to_pandas()
        ds = nxt.drop_columns(["changed"])
        if int(changed["c"].sum()) == 0:
            break

    # assemble (verification-sized rasters only)
    full = np.full((H, W), INF, dtype=np.int64)
    for r in ds.to_pandas().itertuples(index=False):
        y0, x0 = r.ty * tile, r.tx * tile
        full[y0:y0 + r.h, x0:x0 + r.w] = \
            np.asarray(r.dist, dtype=np.int64).reshape(r.h, r.w)
    return full


def dijkstra_reference(dem: np.ndarray,
                       sources: list[tuple[int, int]]) -> np.ndarray:
    """Independent oracle: textbook heapq Dijkstra, enter-cost
    semantics, 4-connected."""
    H, W = dem.shape
    dist = np.full((H, W), INF, dtype=np.int64)
    pq = []
    for sy, sx in sources:
        dist[sy, sx] = 0
        heapq.heappush(pq, (0, sy, sx))
    while pq:
        d, y, x = heapq.heappop(pq)
        if d > dist[y, x]:
            continue
        for ny, nx in ((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1)):
            if 0 <= ny < H and 0 <= nx < W:
                nd = d + int(dem[ny, nx])
                if nd < dist[ny, nx]:
                    dist[ny, nx] = nd
                    heapq.heappush(pq, (nd, ny, nx))
    return dist
