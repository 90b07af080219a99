"""Viewshed: engine vs per-target brute Python ray walk, plus a
handcrafted wall case (exact grazing must block)."""

import math

import numpy as np
import pytest
import ray.data as rd

from geoflow.sources import tiles as tsrc
from geoflow.stages import hydrology as hy
from geoflow.stages.viewshed import H_OBS, viewshed


def brute_visible(dem, oy, ox):
    H, W = dem.shape
    h0 = int(dem[oy, ox]) + H_OBS
    vis = set()
    for ty in range(H):
        for tx in range(W):
            dy, dx = ty - oy, tx - ox
            ady, adx = abs(dy), abs(dx)
            sy = (dy > 0) - (dy < 0)
            sx = (dx > 0) - (dx < 0)
            major = max(adx, ady)
            at = int(dem[ty, tx]) - h0
            dt = dx * dx + dy * dy
            blocked = False
            for i in range(1, major):
                if adx >= ady:
                    px = ox + i * sx
                    py = oy + sy * ((2 * i * ady + adx) // (2 * adx))
                else:
                    py = oy + i * sy
                    px = ox + sx * ((2 * i * adx + ady) // (2 * ady))
                ap = int(dem[py, px]) - h0
                dp = (px - ox) ** 2 + (py - oy) ** 2
                # exact angle(p) >= angle(t) via float is fine for the
                # brute oracle ONLY when no tie; use Fractions of squares
                if ap >= 0 and at < 0:
                    ge = True
                elif ap < 0 and at >= 0:
                    ge = False
                elif ap >= 0:
                    ge = ap * ap * dt >= at * at * dp
                else:
                    ge = ap * ap * dt <= at * at * dp
                if ge:
                    blocked = True
                    break
            if not blocked:
                vis.add(ty * W + tx)
    return vis


def run_engine(dem, tile):
    H, W = dem.shape
    tab = tsrc.raster_to_tile_table(dem[None].astype(np.float32),
                                    dem.astype(np.float64),
                                    raster_id="vs", tile=tile)
    out = viewshed(rd.from_arrow(tab), dem, H // 2, W // 2,
                   tile, tile).to_pandas()
    return set(out["cell"])


def test_matches_brute_on_fixture_crop():
    dem = hy.hydro_dem(48, 64)
    got = run_engine(dem, 16)
    want = brute_visible(dem, 24, 32)
    assert got == want


def test_wall_blocks_and_grazing():
    dem = np.zeros((21, 21), dtype=np.int64)
    dem[10, 13] = 1000          # tall wall east of observer at (10,10)
    got = run_engine(dem, 8)
    W = 21
    # cells due east beyond the wall are blocked
    assert 10 * W + 14 not in got
    assert 10 * W + 20 not in got
    # the wall itself is visible, cells before it too
    assert 10 * W + 13 in got
    assert 10 * W + 12 in got
    # flat ground at equal angle: all flat cells sit BELOW the mast
    # (negative angles improve with distance), nearer flat cells never
    # block farther ones on flat terrain
    assert 10 * W + 0 in got and 0 * W + 10 in got
    want = brute_visible(dem, 10, 10)
    assert got == want


def test_observer_and_neighbors_always_visible():
    dem = hy.hydro_dem(32, 32)
    got = run_engine(dem, 16)
    W = 32
    oy = ox = 16
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            assert (oy + dy) * W + (ox + dx) in got
