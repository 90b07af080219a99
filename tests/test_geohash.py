"""Geohash encode: canonical vectors, bisection-reference parity,
boundary cells."""

import numpy as np

from geoflow.stages.cells import geohash_encode


def ref_geohash(lat, lon, p):
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    lo_lat, hi_lat, lo_lon, hi_lon = -90.0, 90.0, -180.0, 180.0
    bits, out, even = [], [], True
    while len(out) < p:
        if even:
            mid = (lo_lon + hi_lon) / 2
            bits.append(1 if lon >= mid else 0)
            if lon >= mid:
                lo_lon = mid
            else:
                hi_lon = mid
        else:
            mid = (lo_lat + hi_lat) / 2
            bits.append(1 if lat >= mid else 0)
            if lat >= mid:
                lo_lat = mid
            else:
                hi_lat = mid
        even = not even
        if len(bits) == 5:
            out.append(alpha[int("".join(map(str, bits)), 2)])
            bits = []
    return "".join(out)


def test_canonical_vectors():
    # u4pruyd and ezs42 are the published examples; the rest are
    # pinned via the independent bisection reference below
    cases = [((57.64911, 10.40744), 7, "u4pruyd"),
             ((42.605, -5.603), 5, "ezs42"),
             ((40.689247, -74.044502), 7, "dr5r7p6"),
             ((0.0, 0.0), 7, "s000000")]
    for (la, lo), p, want in cases:
        got = geohash_encode(np.array([la]), np.array([lo]), p)[0]
        assert got.decode() == want == ref_geohash(la, lo, p), \
            (la, lo, got, want)


def test_matches_bisection_reference():
    rng = np.random.default_rng(2)
    lats = rng.uniform(-90, 90, 300)
    lons = rng.uniform(-180, 180, 300)
    for p in (1, 4, 7):
        got = geohash_encode(lats, lons, p)
        for la, lo, g in zip(lats, lons, got):
            assert g.decode() == ref_geohash(la, lo, p)


def test_boundaries_clamped():
    lats = np.array([-90.0, 90.0, 89.999999])
    lons = np.array([-180.0, 179.999999, -180.0])
    got = geohash_encode(lats, lons, 7)
    for la, lo, g in zip(lats, lons, got):
        if la < 90.0 and lo < 180.0:
            assert g.decode() == ref_geohash(la, lo, 7)
    # the exact north/east edge clamps into the last cell, not past it
    top = geohash_encode(np.array([90.0]), np.array([180.0]), 7)[0]
    assert top.decode() == "zzzzzzz"


def test_hilbert_canonical_order2():
    """Canonical order-2 Hilbert walk (standard orientation, as on
    the published curve): d=0..15 visits these cells in order."""
    from geoflow.stages.cells import hilbert_d_to_xy, hilbert_xy_to_d

    want = [(0, 0), (1, 0), (1, 1), (0, 1), (0, 2), (0, 3), (1, 3),
            (1, 2), (2, 2), (2, 3), (3, 3), (3, 2), (3, 1), (2, 1),
            (2, 0), (3, 0)]
    x, y = hilbert_d_to_xy(np.arange(16), 2)
    assert list(zip(x.tolist(), y.tolist())) == want
    assert hilbert_xy_to_d(x, y, 2).tolist() == list(range(16))


def test_hilbert_bijection_and_adjacency():
    """THE Hilbert property: the order-6 curve is a bijection on the
    64x64 grid and every consecutive pair of indices is grid-adjacent
    (unit Manhattan step) — independent signal the SQL replay oracle
    (same algorithm) cannot provide."""
    from geoflow.stages.cells import hilbert_d_to_xy, hilbert_xy_to_d

    d = np.arange(64 * 64)
    x, y = hilbert_d_to_xy(d, 6)
    assert (hilbert_xy_to_d(x, y, 6) == d).all()
    assert len({(a, b) for a, b in zip(x.tolist(), y.tolist())}) == 4096
    assert (np.abs(np.diff(x)) + np.abs(np.diff(y)) == 1).all()


def test_hilbert_sql_levels_match_numpy():
    import duckdb

    from geoflow.stages.cells import hilbert_sql_levels, hilbert_xy_to_d

    xs, ys = np.meshgrid(np.arange(64), np.arange(64))
    xs, ys = xs.ravel(), ys.ravel()
    want = hilbert_xy_to_d(xs, ys, 6)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE cells AS SELECT unnest(?) cx, unnest(?) cy,"
        " unnest(?) doc_id",
        [xs.tolist(), ys.tolist(), list(range(len(xs)))])
    sql = ("WITH " + hilbert_sql_levels(6, "cells")
           + " SELECT hd FROM h6 ORDER BY doc_id")
    got = con.execute(sql).df()["hd"].to_numpy()
    assert (got == want).all()
