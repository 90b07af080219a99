"""Cost-distance: distributed label-correcting == independent Dijkstra."""

import numpy as np
import pytest

from geoflow.stages.costdist import (INF, cost_distance_tiles,
                                     dijkstra_reference, local_relax)


def test_matches_dijkstra_on_dem(ray_session):
    from geoflow.stages.hydrology import hydro_dem

    dem = hydro_dem(96, 96)
    src = [(52, 48), (10, 80)]
    got = cost_distance_tiles(dem, src, tile=32)
    want = dijkstra_reference(dem, src)
    assert (got == want).all()


def test_snake_corridor_forces_many_rounds(ray_session):
    """A walled snake corridor makes the shortest path cross tile
    boundaries ~H/2 times — the adversarial case for synchronous
    sweeps (a tile cannot finalize until the wavefront re-enters)."""
    H = W = 24
    cost = np.full((H, W), 10**6, dtype=np.int64)
    y = 0
    going_right = True
    while y < H:
        cost[y, :] = 1          # open row
        if y + 2 < H:           # vertical connector alternating sides
            cost[y + 1, W - 1 if going_right else 0] = 1
        going_right = not going_right
        y += 2
    src = [(0, 0)]
    got = cost_distance_tiles(cost, src, tile=8)
    want = dijkstra_reference(cost, src)
    assert (got == want).all()
    # the far end of the snake is reached through the corridor, not
    # through walls: its distance is corridor-sized, not wall-sized
    assert want[H - 2, 0] < 10**6


def test_ragged_tiles_and_unreachable(ray_session):
    """Non-dividing tile size; sources in one corner; all cells still
    reachable (4-connected grid) and exact."""
    rng = np.random.default_rng(5)
    cost = rng.integers(1, 50, size=(21, 13)).astype(np.int64)
    got = cost_distance_tiles(cost, [(20, 12)], tile=8)
    want = dijkstra_reference(cost, [(20, 12)])
    assert (got == want).all()
    assert (want < INF).all()


def test_local_relax_saturates_inf():
    d = np.full((2, 2), INF, dtype=np.int64)
    c = np.ones((2, 2), dtype=np.int64)
    halo = np.full((4, 4), INF, dtype=np.int64)
    nd, improved = local_relax(d, c, halo)
    assert not improved and (nd == INF).all()
    halo[0, 1] = 0   # a neighbor estimate above cell (0,0)
    nd, improved = local_relax(d, c, halo)
    assert improved
    assert nd[0, 0] == 1 and nd[1, 1] == 3


def test_driver_assembly_guard_raises():
    # broadcast view: 81M "cells" with no allocation — the guard must
    # fire before any tile work touches the data
    dem = np.broadcast_to(np.ones(1, dtype=np.int64), (9000, 9000))
    with pytest.raises(ValueError, match="verification-sized"):
        cost_distance_tiles(dem, [(0, 0)], tile=256)
