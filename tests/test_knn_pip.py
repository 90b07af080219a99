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
