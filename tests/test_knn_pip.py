import numpy as np
import pandas as pd
import pytest

from geoflow.stages import knn, pip_join
from geoflow.stages.geocode import geocode_doc_ids


def _embeddings(n=200, dim=16, seed=9):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(rng.normal(size=(n, dim)).astype(np.float32)),
    })


def test_cosine_topk_matches_bruteforce(ray_session):
    import ray.data as rd
    df = _embeddings()
    ds = rd.from_pandas(df)
    queries = rd.from_pandas(df.head(10))
    out = knn.cosine_topk(queries, ds, k=5).to_pandas()
    ids, mat = knn.normalized_matrix(df, "vec_id", "embedding")
    for qid in range(10):
        sims = mat @ mat[qid]
        sims[qid] = -np.inf
        top = np.argsort(-sims)[:5]
        got = out[out["query_id"] == qid].sort_values("rank")
        assert got["neighbor_id"].tolist() == ids[top].tolist()


def test_cosine_topk_size_guard_routes_to_ivf(ray_session):
    """broadcast_limit=0 forces the auto-route: the distributed-IVF
    full-probe path must return EXACTLY the brute-force broadcast
    result (neighbor sets, ranks, and cosines)."""
    import ray.data as rd
    df = _embeddings(250)
    brute = knn.cosine_topk(rd.from_pandas(df.head(12)),
                            rd.from_pandas(df), k=5).to_pandas()
    routed = knn.cosine_topk(rd.from_pandas(df.head(12)),
                             rd.from_pandas(df).repartition(4), k=5,
                             broadcast_limit=0, nlist=6).to_pandas()
    a = brute.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = routed.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a["neighbor_id"].tolist() == b["neighbor_id"].tolist()
    assert np.allclose(a["cosine"], b["cosine"], atol=1e-12)


def test_cosine_topk_ivf_recall(ray_session):
    import ray
    import ray.data as rd
    df = _embeddings(400)
    index = knn.build_ivf_index(df, "vec_id", "embedding", nlist=8)
    ref = ray.put(index)
    q = rd.from_pandas(df.head(20).rename(
        columns={"vec_id": "query_id"}))
    out = q.map_batches(
        knn.CosineTopKIVF, batch_format="pyarrow",
        fn_constructor_kwargs=dict(index_ref=ref, k=5, nprobe=4),
        concurrency=2).to_pandas()
    ids, mat = knn.normalized_matrix(df, "vec_id", "embedding")
    hits = total = 0
    for qid in range(20):
        sims = mat @ mat[qid]
        sims[qid] = -np.inf          # engine excludes self-matches
        top = set(ids[np.argsort(-sims)[:5]].tolist())
        got = set(out[out["query_id"] == qid]["neighbor_id"].tolist())
        hits += len(top & got)
        total += 5
    assert hits / total >= 0.7  # nprobe=4 of 8 buckets: decent recall


def test_knn_haversine_matches_bruteforce(ray_session):
    import ray.data as rd
    ids = np.arange(2000, dtype=np.int64)
    lat, lon = geocode_doc_ids(ids)
    points = pd.DataFrame({"id": ids, "lat": lat, "lon": lon})
    qids = np.arange(25, dtype=np.int64)
    qlat, qlon = geocode_doc_ids(qids + 100000)
    queries = rd.from_pandas(pd.DataFrame(
        {"query_id": qids, "lat": qlat, "lon": qlon}))
    out = knn.knn_haversine(queries, points, k=5, res=6).to_pandas()
    for q in range(25):
        d = knn.haversine_km(qlat[q], qlon[q], lat, lon)
        order = np.lexsort((ids, d))[:5]
        got = out[out["query_id"] == q].sort_values("rank")["neighbor_id"]
        assert got.tolist() == ids[order].tolist(), f"query {q}"


def test_pip_join_matches_bruteforce(ray_session):
    import ray.data as rd
    ids = np.arange(3000, dtype=np.int64)
    lat, lon = geocode_doc_ids(ids)
    points = pd.DataFrame({"id": ids, "lat": lat, "lon": lon})
    polys = pip_join.make_polygons(48, seed=11)
    expected = pip_join.pip_bruteforce(points, polys)
    got = pip_join.pip_join(rd.from_pandas(points), polys,
                            concurrency=2).to_pandas()
    got = got.sort_values(["id", "region_id"]).reset_index(drop=True)
    assert len(got) == len(expected)
    assert got["id"].tolist() == expected["id"].tolist()
    assert got["region_id"].tolist() == expected["region_id"].tolist()
    assert len(got) > 20  # polygons actually cover points


def test_point_in_ring_concave():
    # concave "C" shape: point in the notch is outside
    ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 3],
                     [3, 3], [3, 1], [0, 1]], dtype=float)
    lat = np.array([2.0, 0.5, 3.5])
    lon = np.array([1.0, 1.0, 1.0])
    inside = pip_join.point_in_ring(lat, lon, ring)
    assert inside.tolist() == [False, True, True]


def test_lsh_ann_recall_on_near_duplicates(ray_session):
    """LSH's operating regime is NEAR neighbors (hyperplane agreement
    p = 1 - angle/pi per bit): plant 3 near-dups (cosine ~0.95) for each
    of 20 queries among 400 distractors and require recall@3 >= 0.8.
    On near-uniform vectors (sf embeddings, top-1 cosine ~0.19) LSH
    degrades to random by design — that regime belongs to IVF/brute."""
    import ray.data as rd
    from geoflow.stages.knn import cosine_topk, cosine_topk_lsh

    rng = np.random.default_rng(5)
    dim, n_q, n_dup = 64, 20, 3
    base = rng.normal(size=(400, dim))
    rows = [(i, base[i]) for i in range(400)]
    nxt = 400
    for q in range(n_q):
        for _ in range(n_dup):
            rows.append((nxt, base[q] + 0.18 * rng.normal(size=dim)))
            nxt += 1
    corpus_df = pd.DataFrame({
        "vec_id": [r[0] for r in rows],
        "embedding": [r[1].astype(np.float64) for r in rows],
    })
    corpus = rd.from_pandas(corpus_df)
    queries = rd.from_pandas(corpus_df.head(n_q))

    exact = cosine_topk(queries, corpus, k=n_dup).to_pandas()
    approx = cosine_topk_lsh(queries, corpus, k=n_dup, dim=dim,
                             num_tables=8, num_bits=10).to_pandas()
    hits = total = 0
    for qid, g in exact.groupby("query_id"):
        truth = set(g["neighbor_id"])
        got = set(approx[approx["query_id"] == qid]["neighbor_id"])
        hits += len(truth & got)
        total += len(truth)
    recall = hits / total
    assert recall >= 0.8, recall
    # reported cosines are exact for the pairs both returned
    m = approx.merge(exact, on=["query_id", "neighbor_id"],
                     suffixes=("_lsh", "_exact"))
    assert np.allclose(m["cosine_lsh"], m["cosine_exact"], atol=1e-12)


def test_strtree_query_matches_bbox_scan():
    """STRtree batch point query == brute-force bbox containment scan,
    over random rect sets of many sizes (incl. the 1-rect edge)."""
    from geoflow.stages.pip_join import STRtree

    rng = np.random.default_rng(12)
    for n in (1, 2, 7, 8, 9, 63, 200):
        lo = rng.uniform(0, 90, size=(n, 2))
        wh = rng.uniform(0.5, 15, size=(n, 2))
        boxes = np.column_stack([lo, lo + wh])     # x0,y0,x1,y1
        tree = STRtree(boxes)
        xs = rng.uniform(-5, 110, 500)
        ys = rng.uniform(-5, 110, 500)
        got = tree.query_points(xs, ys)
        for r in range(n):
            b = boxes[r]
            exp = np.nonzero((b[0] <= xs) & (xs <= b[2])
                             & (b[1] <= ys) & (ys <= b[3]))[0]
            have = np.sort(got.get(r, np.empty(0, dtype=np.int64)))
            assert (have == exp).all(), (n, r)


def test_pip_strtree_equals_grid_and_brute(ray_session):
    import ray.data as rd
    from geoflow.stages.pip_join import (make_polygons, pip_bruteforce,
                                         pip_join)

    rng = np.random.default_rng(21)
    pts = pd.DataFrame({"id": np.arange(3000),
                        "lat": rng.uniform(-60, 70, 3000),
                        "lon": rng.uniform(-179, 179, 3000)})
    polys = make_polygons(48, seed=9)
    exp = pip_bruteforce(pts, polys)
    for index in ("str", "grid"):
        got = (pip_join(rd.from_pandas(pts), polys, concurrency=2,
                        index=index).to_pandas()
               .sort_values(["id", "region_id"]).reset_index(drop=True))
        assert len(got) == len(exp), index
        assert (got["id"].to_numpy() == exp["id"].to_numpy()).all()
        assert (got["region_id"].to_numpy()
                == exp["region_id"].to_numpy()).all()


def test_knn_haversine_shuffle_matches_pinned(ray_session):
    """The no-broadcast cell-shuffle spatial kNN equals the pinned-index
    variant (itself brute-force-exact) when the ring covers the
    neighbor radius."""
    import ray.data as rd

    ids = np.arange(2000, dtype=np.int64)
    lat, lon = geocode_doc_ids(ids)
    points = pd.DataFrame({"id": ids, "lat": lat, "lon": lon})
    qids = np.arange(25, dtype=np.int64)
    qlat, qlon = geocode_doc_ids(qids + 100000)
    qdf = pd.DataFrame({"query_id": qids, "lat": qlat, "lon": qlon})
    exact = knn.knn_haversine(rd.from_pandas(qdf), points, k=5,
                              res=6).to_pandas()
    shuf = knn.knn_haversine_shuffle(
        rd.from_pandas(qdf), rd.from_pandas(points), k=5, res=5,
        ring=2).to_pandas()
    hits = total = 0
    for q in range(25):
        e = exact[exact["query_id"] == q].sort_values("rank")
        s = shuf[shuf["query_id"] == q].sort_values("rank")
        hits += len(set(e["neighbor_id"]) & set(s["neighbor_id"]))
        total += len(e)
    assert hits / total >= 0.95, hits / total


def test_ivf_distributed_build_full_probe_is_exact(ray_session):
    """Distributed IVF build (map_batches k-means partials + object-store
    block refs, no driver corpus materialization): probing ALL buckets
    must reproduce the exact brute-force top-k — bucketing is then a
    pure partition of the corpus, so any divergence is an
    assembly/assignment bug, not an approximation."""
    import ray
    import ray.data as rd
    df = _embeddings(300)
    ds = rd.from_pandas(df).repartition(4)
    index = knn.build_ivf_index_distributed(ds, "vec_id", "embedding",
                                            nlist=6)
    cent, refs = index
    assert cent.shape == (6, len(df["embedding"].iloc[0]))
    ref = ray.put(index)
    q = rd.from_pandas(df.head(15).rename(columns={"vec_id": "query_id"}))
    out = q.map_batches(
        knn.CosineTopKIVF, batch_format="pyarrow",
        fn_constructor_kwargs=dict(index_ref=ref, k=5, nprobe=6),
        concurrency=2).to_pandas()
    ids, mat = knn.normalized_matrix(df, "vec_id", "embedding")
    for qid in range(15):
        sims = mat @ mat[qid]
        sims[qid] = -np.inf
        exact = set(ids[np.argsort(-sims)[:5]].tolist())
        got = set(out[out["query_id"] == qid]["neighbor_id"].tolist())
        assert got == exact, qid


# ---------------------------------------------------------------------------
# polygon_metrics: closed-form shapes + fixture consistency
# ---------------------------------------------------------------------------

def test_polygon_metrics_known_shapes():
    import pandas as pd
    import ray.data as rd

    from geoflow.stages.pip_join import polygon_metrics

    # unit square (CCW) and a 3-4-5 right triangle
    square = [(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]
    tri = [(0, 0), (3, 0), (0, 4), (0, 0)]
    rows = []
    for rid, ring in ((0, square), (1, tri)):
        for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
            rows.append((rid, float(x1), float(y1), float(x2), float(y2)))
    edges = pd.DataFrame(rows, columns=["region_id", "x1", "y1",
                                        "x2", "y2"])
    got = (polygon_metrics(rd.from_pandas(edges).repartition(3))
           .to_pandas().set_index("region_id").sort_index())
    assert got.loc[0, "area"] == 1.0
    assert got.loc[0, "perimeter"] == 4.0
    assert (got.loc[0, "centroid_x"], got.loc[0, "centroid_y"]) == (0.5, 0.5)
    assert got.loc[0, "n_vertices"] == 4
    assert got.loc[1, "area"] == 6.0
    assert got.loc[1, "perimeter"] == 12.0
    assert (got.loc[1, "centroid_x"],
            got.loc[1, "centroid_y"]) == (1.0, round(4 / 3, 6))


def test_polygon_metrics_fixture_positive_and_partition_invariant():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from geoflow.stages.pip_join import make_polygons, polygon_metrics

    rows = []
    for poly in make_polygons(16, seed=42).itertuples(index=False):
        ring = np.asarray(poly.ring, dtype=np.float64)
        if (ring[0] != ring[-1]).any():
            ring = np.vstack([ring, ring[0]])
        for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
            rows.append((int(poly.region_id), x1, y1, x2, y2))
    edges = pd.DataFrame(rows, columns=["region_id", "x1", "y1",
                                        "x2", "y2"])
    a = (polygon_metrics(rd.from_pandas(edges)).to_pandas()
         .sort_values("region_id").reset_index(drop=True))
    b = (polygon_metrics(rd.from_pandas(edges).repartition(7)).to_pandas()
         .sort_values("region_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert (a["area"] > 0).all()      # rings are CCW by construction
    assert (a["perimeter"] > 0).all()
    assert len(a) == 16
