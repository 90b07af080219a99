"""Corridor query: exact integer point-to-segment test vs a float
reference, endpoint/interior cases, segment-length bound."""

import numpy as np
import pandas as pd
import ray.data as rd

from geoflow.stages.geocode import (corridor_hits, corridor_segments,
                                    geocode_doc_ids)


def float_dist2(px, py, ax, ay, bx, by):
    apx, apy = px - ax, py - ay
    abx, aby = bx - ax, by - ay
    ab2 = abx * abx + aby * aby
    t = np.clip((apx * abx + apy * aby) / ab2, 0.0, 1.0)
    dx = px - (ax + t * abx)
    dy = py - (ay + t * aby)
    return dx * dx + dy * dy


def test_segments_bounded_for_int64():
    segs = np.array(corridor_segments(), dtype=np.int64)
    ln2 = (segs[:, 2] - segs[:, 0]) ** 2 + (segs[:, 3] - segs[:, 1]) ** 2
    assert (ln2 <= (18 * 100) ** 2 * 2).all()
    # worst-case cross-multiplied product fits int64
    ap2_max = 2 * (54000 ** 2)
    assert ap2_max * ln2.max() < 2 ** 63


def test_matches_float_reference():
    ids = np.arange(2000, dtype=np.int64)
    lat, lon = geocode_doc_ids(ids)
    pts = rd.from_pandas(pd.DataFrame(
        {"doc_id": ids, "lat": lat, "lon": lon})).repartition(4)
    got = corridor_hits(pts, radius_cd=800).to_pandas()
    segs = np.array(corridor_segments(), dtype=np.float64)
    px = np.floor(lon * 100.0 + 0.5)
    py = np.floor(lat * 100.0 + 0.5)
    want_ids = set()
    for i in range(len(ids)):
        d2 = min(float_dist2(px[i], py[i], *s) for s in segs)
        if d2 <= 800.0 ** 2 + 1e-6:
            want_ids.add(ids[i])
    # integer test == float test except razor-edge ties; none expected
    assert set(got["doc_id"]) == want_ids
    assert (got["n_seg_hits"] >= 1).all()
    # first_seg is the smallest hitting index
    row = got.iloc[0]
    assert row["first_seg"] >= 0


def test_endpoint_vs_interior_cases():
    # point beyond segment end uses endpoint distance, not line distance
    segs = corridor_segments()
    ax, ay, bx, by = segs[0]
    pts = pd.DataFrame({
        "doc_id": np.array([1, 2], dtype=np.int64),
        # one point past A along BA (endpoint case), one near middle
        "lat": [(ay - 700) / 100.0, (ay + by) / 2 / 100.0 + 3.0],
        "lon": [(ax - (bx - ax)) / 100.0, (ax + bx) / 2 / 100.0]})
    got = corridor_hits(rd.from_pandas(pts), radius_cd=800).to_pandas()
    assert 2 in set(got["doc_id"])


def test_snap_to_route_matches_bruteforce(ray_session):
    """Integer-numerator argmin == exact rational brute force (python
    ints, no overflow) over random points, including ties."""
    import pandas as pd
    import ray.data as rd

    from geoflow.stages.geocode import (MATCH_AB2, match_segments,
                                        snap_to_route)

    rng = np.random.default_rng(11)
    lat = rng.uniform(35, 50, 400)
    lon = rng.uniform(-80, -60, 400)
    ds = rd.from_pandas(pd.DataFrame({
        "event_id": np.arange(400), "user_id": np.arange(400) % 7,
        "lat": lat, "lon": lon}))
    got = snap_to_route(ds).to_pandas().sort_values("event_id")

    segs = match_segments()
    want = []
    for la, lo in zip(lat, lon):
        px = int(np.floor(lo * 100.0 + 0.5))
        py = int(np.floor(la * 100.0 + 0.5))
        best = None
        for si, (ax, ay, bx, by) in enumerate(segs):
            dot = (px - ax) * (bx - ax) + (py - ay) * (by - ay)
            if dot <= 0:
                num = ((px - ax) ** 2 + (py - ay) ** 2) * MATCH_AB2
            elif dot >= MATCH_AB2:
                num = ((px - bx) ** 2 + (py - by) ** 2) * MATCH_AB2
            else:
                num = (((px - ax) ** 2 + (py - ay) ** 2) * MATCH_AB2
                       - dot * dot)
            if best is None or num < best[0]:
                best = (num, si)
        want.append(best[1])
    assert got["seg"].tolist() == want
