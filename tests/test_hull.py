"""Per-cell convex hulls: monotone chain vs brute Caratheodory test on
integer coordinates, incl. collinear runs and duplicate points."""

import itertools

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from geoflow.stages.geocluster import _monotone_chain, cell_convex_hulls


def brute_vertices(pts):
    """p is a hull vertex iff no triangle (or degenerate segment) of
    other points contains it."""

    def cross(a, b, p):
        return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])

    def in_tri(p, a, b, c):
        s1, s2, s3 = cross(a, b, p), cross(b, c, p), cross(c, a, p)
        if s1 == 0 and s2 == 0 and s3 == 0:
            return (min(a[0], b[0], c[0]) <= p[0] <= max(a[0], b[0], c[0])
                    and min(a[1], b[1], c[1]) <= p[1]
                    <= max(a[1], b[1], c[1]))
        return (s1 >= 0 and s2 >= 0 and s3 >= 0) or \
               (s1 <= 0 and s2 <= 0 and s3 <= 0)

    def on_seg(p, a, b):
        return (cross(a, b, p) == 0
                and min(a[0], b[0]) <= p[0] <= max(a[0], b[0])
                and min(a[1], b[1]) <= p[1] <= max(a[1], b[1]))

    out = []
    for i, p in enumerate(pts):
        others = [q for j, q in enumerate(pts) if j != i]
        inside = any(in_tri(p, a, b, c)
                     for a, b, c in itertools.combinations(others, 3))
        inside = inside or any(on_seg(p, a, b)
                               for a, b in itertools.combinations(others, 2))
        if not inside:
            out.append(i)
    return set(out)


@pytest.mark.parametrize("case", [
    "random", "collinear", "grid", "tiny1", "tiny2", "mixed"])
def test_chain_matches_brute(case):
    rng = np.random.default_rng(hash(case) % 2**31)
    if case == "random":
        pts = [tuple(p) for p in rng.integers(0, 100, (25, 2))]
    elif case == "collinear":
        pts = [(i * 3, i * 3 + 1) for i in range(8)]
    elif case == "grid":
        pts = [(x, y) for x in range(4) for y in range(4)]
    elif case == "tiny1":
        pts = [(5, 7)]
    elif case == "tiny2":
        pts = [(5, 7), (9, 2)]
    else:
        pts = [(0, 0), (10, 0), (5, 0), (10, 10), (0, 10), (5, 5),
               (3, 0), (0, 5)]
    pts = list(dict.fromkeys(pts))  # chain expects deduped coords
    x = np.array([p[0] for p in pts], dtype=np.int64)
    y = np.array([p[1] for p in pts], dtype=np.int64)
    got = set(_monotone_chain(x, y).tolist())
    assert got == brute_vertices(pts), case


def test_cell_convex_hulls_dedup_and_cells():
    # duplicated corner point keeps min doc_id; two separate cells
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6, 7],
        "lat": [10.0, 10.0, 12.0, 11.0, 11.0, -40.0, -41.0],
        "lon": [20.0, 22.0, 21.0, 21.0, 20.0, 100.0, 101.0],
    })
    df.loc[4, ["lat", "lon"]] = df.loc[0, ["lat", "lon"]]  # dup of doc 1
    out = cell_convex_hulls(rd.from_pandas(df).repartition(2)) \
        .to_pandas().sort_values("doc_id")
    assert 5 not in set(out["doc_id"])        # dup collapsed to doc 1
    assert {6, 7} <= set(out["doc_id"])       # 2-point cell: both
    assert 1 in set(out["doc_id"])
    cells = out.groupby(["cell_x", "cell_y"]).size()
    assert len(cells) == 2
