"""Grid-DBSCAN: brute-force parity, replication invariants, edge cases."""

import math

import numpy as np
import pyarrow as pa
import ray.data as rd

from geoflow.stages.geocluster import dbscan_pairs, grid_dbscan
from geoflow.stages.geocode import geocode_doc_ids


def _brute_reference(ids, lat, lon, eps, min_pts):
    """Deterministic DBSCAN reference: min-label core components,
    borders labeled by the min cluster among core neighbors."""
    dlat = lat[:, None] - lat[None, :]
    dlon = lon[:, None] - lon[None, :]
    adj = (dlat * dlat + dlon * dlon) <= eps * eps
    core = adj.sum(1) >= min_pts
    lbl = np.where(core, ids, np.int64(2**62))
    A = adj & core[:, None] & core[None, :]
    np.fill_diagonal(A, False)
    for _ in range(len(ids)):
        new = lbl.copy()
        for i in np.flatnonzero(core):
            nb = np.flatnonzero(A[i])
            if len(nb):
                new[i] = min(lbl[i], lbl[nb].min())
        if (new == lbl).all():
            break
        lbl = new
    exp = {}
    for i in np.flatnonzero(core):
        exp[int(ids[i])] = (int(lbl[i]), 1)
    for i in np.flatnonzero(~core):
        cn = np.flatnonzero(adj[i] & core & (ids != ids[i]))
        if len(cn):
            exp[int(ids[i])] = (int(min(lbl[j] for j in cn)), 0)
    return exp


def _points_ds(n):
    ids = np.arange(n, dtype=np.int64)
    lat, lon = geocode_doc_ids(ids)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids), "lat": pa.array(lat),
        "lon": pa.array(lon)})).repartition(3)
    return ids, lat, lon, ds


def test_pairs_symmetric_and_exact():
    ids, lat, lon, ds = _points_ds(200)
    eps = 0.03 * math.sqrt(5000.0 / 200)
    got = dbscan_pairs(ds, eps, num_buckets=8).to_pandas()
    pairs = set(zip(got["pa"], got["pb"]))
    assert len(pairs) == len(got), "duplicate emitted pair"
    dlat = lat[:, None] - lat[None, :]
    dlon = lon[:, None] - lon[None, :]
    adj = (dlat * dlat + dlon * dlon) <= eps * eps
    np.fill_diagonal(adj, False)
    exp = {(int(ids[i]), int(ids[j])) for i, j in zip(*np.nonzero(adj))}
    assert pairs == exp
    assert all((b, a) in pairs for a, b in pairs), "asymmetric pair set"


def test_grid_dbscan_matches_brute_force():
    n = 300
    ids, lat, lon, ds = _points_ds(n)
    eps = 0.03 * math.sqrt(5000.0 / n)
    got = grid_dbscan(ds, eps, min_pts=5, num_buckets=8).to_pandas()
    gm = {int(r.doc_id): (int(r.cluster), int(r.is_core))
          for r in got.itertuples()}
    assert gm == _brute_reference(ids, lat, lon, eps, 5)


def test_all_noise_when_eps_tiny():
    _, _, _, ds = _points_ds(100)
    got = grid_dbscan(ds, eps=1e-12, min_pts=2, num_buckets=4).to_pandas()
    assert len(got) == 0


def test_single_cluster_when_eps_huge():
    ids, lat, lon, ds = _points_ds(60)
    got = grid_dbscan(ds, eps=1000.0, min_pts=2, num_buckets=4).to_pandas()
    assert len(got) == 60
    assert set(got["cluster"]) == {0}
    assert (got["is_core"] == 1).all()


def test_border_takes_min_core_cluster():
    # two clusters, each an outpost core (10 / 20) backed by three
    # co-located points; bridge point 30 touches only the two outposts
    # (3 neighbors incl. self < min_pts=4), so it is a BORDER point
    # adjacent to cores of BOTH clusters
    lat = np.array([0.0, -0.4, -0.4, -0.4, 1.0, 1.4, 1.4, 1.4, 0.5])
    lon = np.zeros(9)
    ids = np.array([10, 11, 12, 13, 20, 21, 22, 23, 30], dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids),
                                 "lat": pa.array(lat),
                                 "lon": pa.array(lon)}))
    got = grid_dbscan(ds, eps=0.55, min_pts=4, num_buckets=2).to_pandas()
    gm = {int(r.doc_id): (int(r.cluster), int(r.is_core))
          for r in got.itertuples()}
    exp = _brute_reference(ids, lat, lon, 0.55, 4)
    assert gm == exp
    assert gm[30] == (10, 0)  # border, assigned the MIN cluster label
    assert gm[20] == (20, 1) and gm[10] == (10, 1)  # clusters stay apart


# ---------------------------------------------------------------------------
# travel_stats (stages/geocode.py) shares the geo test module: per-user
# consecutive-leg haversine rollup
# ---------------------------------------------------------------------------

def test_travel_stats_matches_pandas_reference():
    import pandas as pd

    from geoflow.stages.geocode import geocode_doc_ids as gc
    from geoflow.stages.geocode import travel_stats
    from geoflow.stages.knn import haversine_km

    rng = np.random.default_rng(7)
    n = 400
    eid = np.arange(n, dtype=np.int64)
    uid = rng.integers(0, 25, n).astype(np.int64)
    ts = pd.to_datetime(rng.integers(0, 10_000, n), unit="s")
    ds = rd.from_arrow(pa.table({
        "event_id": pa.array(eid), "user_id": pa.array(uid),
        "ts": pa.array(ts)})).repartition(5)
    got = (travel_stats(ds, num_buckets=8).to_pandas()
           .sort_values("user_id").reset_index(drop=True))

    lat, lon = gc(eid)
    df = (pd.DataFrame({"user_id": uid, "ts": ts, "event_id": eid,
                        "lat": lat, "lon": lon})
          .sort_values(["user_id", "ts", "event_id"]))
    rows = []
    for u, g in df.groupby("user_id"):
        if len(g) < 2:
            continue
        km = haversine_km(g["lat"].to_numpy()[:-1], g["lon"].to_numpy()[:-1],
                          g["lat"].to_numpy()[1:], g["lon"].to_numpy()[1:])
        rows.append((u, len(km), round(km.sum(), 3), round(km.max(), 3)))
    exp = pd.DataFrame(rows, columns=["user_id", "n_legs", "total_km",
                                      "max_leg_km"])
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True),
                                  check_dtype=False)


def test_travel_stats_drops_single_event_users_and_breaks_ts_ties():
    import pandas as pd

    from geoflow.stages.geocode import travel_stats

    # user 1: two events with IDENTICAL ts -> leg order fixed by
    # event_id; user 2: one event -> dropped
    t0 = pd.Timestamp("2026-01-01")
    ds = rd.from_arrow(pa.table({
        "event_id": pa.array([5, 3, 9], pa.int64()),
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array([t0, t0, t0])}))
    got = travel_stats(ds, num_buckets=2).to_pandas()
    assert got["user_id"].tolist() == [1]
    assert got["n_legs"].tolist() == [1]
    assert (got["total_km"] > 0).all()
