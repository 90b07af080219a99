"""Point-in-polygon join: pinned spatial index in an actor pool.

North-rule operator ("STRtree point-in-polygon joins ... executed via
actor pools holding pinned spatial indexes"). No shapely in this
environment (SURVEY.md section 7.0), so the index is hand-rolled:

- index = polygon bboxes sorted into a uniform lon/lat grid (an
  STRtree stand-in with the same O(candidates) query contract),
- candidates per point via its grid bucket, then an exact even-odd
  ray-casting test (vectorized numpy over all points x one polygon).

The polygon table is the SMALL side: it is ``ray.put`` once and pinned
per actor in ``__init__`` (``fn_constructor_kwargs``), never re-shipped
per batch. A point matching multiple (overlapping) polygons emits one
row per match, ordered by region_id — deterministic output.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def point_in_ring(lat: np.ndarray, lon: np.ndarray,
                  ring: np.ndarray) -> np.ndarray:
    """Even-odd rule; ring is (n,2) [lon, lat], closed or open."""
    x, y = lon, lat
    rx, ry = ring[:, 0], ring[:, 1]
    if rx[0] != rx[-1] or ry[0] != ry[-1]:
        rx = np.append(rx, rx[0])
        ry = np.append(ry, ry[0])
    inside = np.zeros(len(x), dtype=bool)
    for i in range(len(rx) - 1):
        x1, y1, x2, y2 = rx[i], ry[i], rx[i + 1], ry[i + 1]
        cond = ((y1 > y) != (y2 > y))
        with np.errstate(divide="ignore", invalid="ignore"):
            xin = (x2 - x1) * (y - y1) / (y2 - y1) + x1
        inside ^= cond & (x < xin)
    return inside


def make_polygons(n: int = 64, seed: int = 42) -> pd.DataFrame:
    """Deterministic synthetic polygon table (FIXTURES.md F4): convex
    fans + a few concave stars, with overlapping pairs."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        clat = rng.uniform(-55, 65)
        clon = rng.uniform(-175, 175)
        r = rng.uniform(1.0, 6.0)
        nv = int(rng.integers(4, 9))
        angles = np.sort(rng.uniform(0, 2 * np.pi, nv))
        radii = np.full(nv, r)
        if i % 5 == 0:   # concave star
            radii[::2] *= 0.45
        ring = np.stack([clon + radii * np.cos(angles),
                         clat + radii * np.sin(angles)], axis=1)
        if i % 7 == 0 and rows:   # overlap with the previous polygon
            prev = np.asarray(rows[-1]["ring"])
            ring = prev + rng.uniform(-0.5, 0.5, size=2)
        rows.append({"region_id": i, "name": f"region{i}", "ring": ring.tolist()})
    return pd.DataFrame(rows)


def pip_bruteforce(points: pd.DataFrame, polygons: pd.DataFrame) -> pd.DataFrame:
    """Oracle: test every point against every polygon."""
    out = []
    lat = points["lat"].to_numpy()
    lon = points["lon"].to_numpy()
    ids = points["id"].to_numpy()
    for poly in polygons.itertuples(index=False):
        ring = np.asarray(poly.ring, dtype=np.float64)
        hit = point_in_ring(lat, lon, ring)
        for pid in ids[hit]:
            out.append((pid, poly.region_id))
    df = pd.DataFrame(out, columns=["id", "region_id"])
    return df.sort_values(["id", "region_id"]).reset_index(drop=True)


class GridIndex:
    """Uniform-grid bbox index over polygons (STRtree stand-in)."""

    def __init__(self, polygons: pd.DataFrame, grid: int = 64):
        self.grid = grid
        self.rings = [np.asarray(r, dtype=np.float64)
                      for r in polygons["ring"]]
        self.region_ids = polygons["region_id"].to_numpy()
        self.bboxes = np.array([
            [r[:, 0].min(), r[:, 1].min(), r[:, 0].max(), r[:, 1].max()]
            for r in self.rings])
        self.buckets: dict[tuple[int, int], list[int]] = {}
        for i, (x0, y0, x1, y1) in enumerate(self.bboxes):
            for gx in range(self._gx(x0), self._gx(x1) + 1):
                for gy in range(self._gy(y0), self._gy(y1) + 1):
                    self.buckets.setdefault((gx, gy), []).append(i)

    def _gx(self, lon: float) -> int:
        return min(self.grid - 1, max(0, int((lon + 180) / 360 * self.grid)))

    def _gy(self, lat: float) -> int:
        return min(self.grid - 1, max(0, int((lat + 90) / 180 * self.grid)))

    def candidates(self, lat: np.ndarray, lon: np.ndarray) -> dict[int, np.ndarray]:
        """polygon idx -> indices of points whose bucket intersects it."""
        gx = np.minimum(self.grid - 1, np.maximum(
            0, ((lon + 180) / 360 * self.grid).astype(int)))
        gy = np.minimum(self.grid - 1, np.maximum(
            0, ((lat + 90) / 180 * self.grid).astype(int)))
        by_poly: dict[int, list[int]] = {}
        # group points by bucket, then fan out to that bucket's polygons
        order = np.lexsort((gy, gx))
        keys = gx[order] * self.grid + gy[order]
        bounds = np.flatnonzero(np.diff(keys)) + 1
        for seg in np.split(order, bounds):
            b = (int(gx[seg[0]]), int(gy[seg[0]]))
            for poly_idx in self.buckets.get(b, ()):
                by_poly.setdefault(poly_idx, []).append(seg)
        return {p: np.concatenate(segs) for p, segs in by_poly.items()}


class PIPJoiner:
    """Actor-pool callable: points batch -> (id, region_id, name) matches."""

    def __init__(self, polygons_ref, grid: int = 64):
        import ray
        polygons = ray.get(polygons_ref)
        self.index = GridIndex(polygons, grid)
        self.names = polygons["name"].to_numpy()

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy()
        lon = batch.column("lon").to_numpy()
        ids = batch.column("id").to_numpy()
        out_id, out_region, out_name = [], [], []
        for poly_idx, pt_idx in self.index.candidates(lat, lon).items():
            ring = self.index.rings[poly_idx]
            bb = self.index.bboxes[poly_idx]
            la, lo = lat[pt_idx], lon[pt_idx]
            near = (lo >= bb[0]) & (lo <= bb[2]) & (la >= bb[1]) & (la <= bb[3])
            pt_near = pt_idx[near]
            if not len(pt_near):
                continue
            hit = point_in_ring(lat[pt_near], lon[pt_near], ring)
            matched = pt_near[hit]
            out_id.extend(ids[matched].tolist())
            out_region.extend([self.index.region_ids[poly_idx]] * len(matched))
            out_name.extend([self.names[poly_idx]] * len(matched))
    # deterministic within-batch order: (id, region_id)
        if out_id:
            o = np.lexsort((np.array(out_region), np.array(out_id)))
        else:
            o = np.array([], dtype=int)
        return pa.table({
            "id": pa.array(np.asarray(out_id, dtype=np.int64)[o]),
            "region_id": pa.array(np.asarray(out_region, dtype=np.int64)[o]),
            "name": pa.array(np.asarray(out_name, dtype=object)[o]
                             if len(o) else [], pa.string()),
        })


def pip_join(points_ds, polygons: pd.DataFrame, concurrency: int = 4,
             grid: int = 64):
    """points_ds(id, lat, lon) |> PIP join against the polygon table."""
    import ray

    ref = ray.put(polygons)
    return points_ds.map_batches(
        PIPJoiner, batch_format="pyarrow",
        fn_constructor_kwargs=dict(polygons_ref=ref, grid=grid),
        concurrency=(1, concurrency), batch_size=4096,
    )
