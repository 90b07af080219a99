"""BFS hop distance: brute-force parity on random directed graphs,
convergence idempotence (extra rounds change nothing), unreached-node
exclusion."""

import numpy as np
import pytest


def brute_bfs(n, edges, seeds):
    from collections import deque
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _run(edges_np, n, rounds, ray_ok=True):
    import pyarrow as pa
    import ray.data as rd

    from geoflow.stages.graph import bfs_hops

    pairs = rd.from_arrow(pa.table({
        "src": pa.array(edges_np[:, 0], pa.int64()),
        "dst": pa.array(edges_np[:, 1], pa.int64())}))
    nodes = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64())}))
    out = bfs_hops(pairs, nodes, seed_pred=lambda ids: ids < 2,
                   rounds=rounds).to_pandas()
    return dict(zip(out["doc_id"].tolist(), out["hops"].tolist()))


def test_matches_brute(ray_session):
    rng = np.random.default_rng(3)
    n = 120
    edges = rng.integers(0, n, size=(300, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    got = _run(edges, n, rounds=12)
    exp = brute_bfs(n, map(tuple, edges.tolist()), [0, 1])
    # rounds=12 covers every distance <= 12; the fixture's diameter
    # from the seeds is far smaller (check, then compare exactly)
    assert max(exp.values()) <= 12
    assert got == exp


def test_extra_rounds_are_noops(ray_session):
    edges = np.array([[0, 2], [2, 3], [3, 4], [5, 6]])
    got8 = _run(edges, 7, rounds=8)
    got3 = _run(edges, 7, rounds=3)
    assert got8 == got3 == {0: 0, 1: 0, 2: 1, 3: 2, 4: 3}
    # 5 and 6 unreached from seeds {0,1}: excluded, not INF rows
    assert 5 not in got8 and 6 not in got8
