"""Property-based tests (hypothesis) for the pure kernels."""

import numpy as np
from hypothesis import given, settings, strategies as st

from geoflow.stages import cells
from geoflow.stages.extract import extract_text
from geoflow.stages.knn import haversine_km


@given(lat=st.floats(-89.999, 89.999), lon=st.floats(-180.0, 179.999),
       res=st.integers(0, 29))
@settings(max_examples=200, deadline=None)
def test_cell_contains_point(lat, lon, res):
    c = cells.cell_id(np.array([lat]), np.array([lon]), res)
    clat, clon = cells.cell_center(c)
    half_lat = 90.0 / (1 << res)
    half_lon = 180.0 / (1 << res)
    assert abs(clat[0] - lat) <= half_lat + 1e-9
    assert abs(clon[0] - lon) <= half_lon + 1e-9


@given(lat=st.floats(-89.0, 89.0), lon=st.floats(-179.999, 179.999),
       fine=st.integers(1, 29), coarse_off=st.integers(1, 10))
@settings(max_examples=200, deadline=None)
def test_parent_consistency(lat, lon, fine, coarse_off):
    coarse = max(0, fine - coarse_off)
    la = np.array([lat])
    lo = np.array([lon])
    via_parent = cells.cell_parent(cells.cell_id(la, lo, fine), coarse)
    direct = cells.cell_id(la, lo, coarse)
    assert via_parent[0] == direct[0]


@given(st.text(max_size=500))
@settings(max_examples=150, deadline=None)
def test_extract_total_and_idempotent_shape(html_text):
    """Extractor never raises on arbitrary text and its output is
    whitespace-canonical (no leading/trailing/blank lines, single
    spaces)."""
    out = extract_text(html_text.encode("utf-8", "surrogatepass"))
    if out == "":
        return
    for line in out.split("\n"):
        assert line == line.strip()
        assert "  " not in line
        assert line != ""


@given(lat1=st.floats(-89, 89), lon1=st.floats(-180, 180),
       lat2=st.floats(-89, 89), lon2=st.floats(-180, 180))
@settings(max_examples=200, deadline=None)
def test_haversine_properties(lat1, lon1, lat2, lon2):
    d = float(haversine_km(lat1, lon1, lat2, lon2))
    assert 0 <= d <= 20016  # half circumference
    d2 = float(haversine_km(lat2, lon2, lat1, lon1))
    assert abs(d - d2) < 1e-6
    assert float(haversine_km(lat1, lon1, lat1, lon1)) < 1e-6


@given(vals=st.lists(st.integers(0, 30), min_size=1, max_size=300),
       q=st.floats(0.0, 1.0))
@settings(max_examples=200, deadline=None)
def test_quantile_from_counts_property(vals, q):
    from geoflow.functions.agg import quantile_from_counts

    arr = np.array(vals, dtype=np.float64)
    uniq, counts = np.unique(arr, return_counts=True)
    got = quantile_from_counts(uniq, counts, q)
    exp = float(np.percentile(arr, q * 100))
    assert abs(got - exp) < 1e-9


@given(seed=st.integers(0, 10_000), n=st.integers(1, 3000),
       p=st.integers(4, 14))
@settings(max_examples=60, deadline=None)
def test_hll_merge_equals_oneshot_property(seed, n, p):
    """Splitting a stream arbitrarily and max-merging the registers
    always equals hashing the whole stream at once (associativity —
    the property that makes the sketch safe under ANY partitioning)."""
    from geoflow.functions.sketch import hll_registers

    rng = np.random.default_rng(seed)
    h = rng.integers(0, 2**63, size=n, dtype=np.int64).astype(np.uint64)
    cut = int(rng.integers(0, n + 1))
    merged = np.maximum(hll_registers(h[:cut], p), hll_registers(h[cut:], p))
    assert (merged == hll_registers(h, p)).all()


@given(seed=st.integers(0, 10_000))
@settings(max_examples=100, deadline=None)
def test_range_probe_matches_scan(seed):
    """searchsorted interval probe == linear interval scan, including
    values in gaps and outside all bands."""
    rng = np.random.default_rng(seed)
    edges = np.sort(rng.uniform(0, 100, 6))
    lows, highs = edges[[0, 2, 4]], edges[[1, 3, 5]]
    v = rng.uniform(-10, 110, 200)
    idx = np.searchsorted(lows, v, side="right") - 1
    ok = (idx >= 0) & (v < highs[np.clip(idx, 0, len(highs) - 1)])
    for j in range(len(v)):
        hit = [i for i in range(3) if lows[i] <= v[j] < highs[i]]
        assert ok[j] == bool(hit)
        if hit:
            assert idx[j] == hit[0]


@given(st.lists(st.integers(0, (1 << 62) - 1), min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_mersenne_folding_equals_modulo(xs):
    """_mod_p31 (shift/add folding) == hardware % for all x < 2^62."""
    from geoflow.stages.dedup import _P31, _mod_p31

    x = np.array(xs, dtype=np.uint64)
    assert (_mod_p31(x) == x % _P31).all()


@given(st.lists(st.integers(0, (1 << 64) - 1), min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_popcount64_matches_python(xs):
    from geoflow.stages.dedup import popcount64

    x = np.array(xs, dtype=np.uint64)
    got = popcount64(x)
    assert got.tolist() == [bin(v).count("1") for v in xs]


@given(st.integers(1, 40), st.integers(1, 40), st.integers(1, 4),
       st.integers(0, 2**31 - 1))
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_random_shapes(h, w, c, seed):
    from geoflow.stages.multimodal import decode_png, encode_png

    if c == 2:
        c = 4   # color types: 1 gray, 3 RGB, 4 RGBA (2 = gray+alpha
                # is writable too, but keep the strategy space small)
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    assert (decode_png(encode_png(img)) == img).all()


@given(st.integers(1, 5000), st.integers(0, 2**31 - 1))
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_random(n, seed):
    from geoflow.stages.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, n).astype(np.float32)
    sr, back = decode_wav(encode_wav(8000, x))
    assert sr == 8000 and len(back) == n
    assert np.abs(back - x).max() <= 2.0 / 32768


def test_jaccard_df_cap_bounds_bucket_pairs():
    """Adversarial common-shingle bucket: one boilerplate shingle shared
    by ALL n docs. Uncapped, the self-merge emits O(n^2) pair partials;
    with max_df the bucket's output is bounded by max_df * postings and
    the boilerplate shingle contributes nothing."""
    import pandas as pd
    from geoflow.stages.dedup import bucket_pair_partials

    n = 400
    # boilerplate shingle 999 in every doc + one private shingle per doc
    # + shingle shared by doc pairs (2i, 2i+1) so some pairs survive
    rows = []
    for d in range(n):
        rows.append((999, d, 3))
        rows.append((10_000 + d, d, 3))
        rows.append((20_000 + d // 2, d, 3))
    g = pd.DataFrame(rows, columns=["sh", "doc", "nsh"])
    g["nsh_a"] = g["nsh"]

    full = bucket_pair_partials(
        g.rename(columns={"nsh": "nsh_"}).assign(nsh=3)[["sh", "doc", "nsh"]])
    capped = bucket_pair_partials(
        g[["sh", "doc", "nsh"]], max_df=10)
    # uncapped: boilerplate alone emits n*(n-1)/2 partials
    assert len(full) >= n * (n - 1) // 2
    # capped: only the pair-shared shingles survive (df=2 <= 10) ->
    # exactly n/2 partials, each with intersection count 1
    assert len(capped) == n // 2
    assert (capped["i"] == 1).all()
    assert set(zip(capped["doc_a"], capped["doc_b"])) == {
        (2 * i, 2 * i + 1) for i in range(n // 2)}
    # bound: emitted partials <= max_df * kept postings (trivially holds)
    assert len(capped) <= 10 * len(g)


def test_jaccard_pairs_exact_df_cap_end_to_end(ray_session):
    """Capped distributed run == uncapped with the boilerplate shingle's
    intersection contribution removed (set sizes untouched: capped
    Jaccard is a lower bound)."""
    import pyarrow as pa
    import ray.data as rd
    from geoflow.stages.dedup import jaccard_pairs_exact

    boiler = "the same old boilerplate"
    docs = []
    for i in range(30):
        # pairs (2i, 2i+1) share a long unique body -> high Jaccard
        body = f"unique body {i // 2} with shared words alpha beta gamma"
        docs.append({"doc_id": i, "text": f"{boiler} {body} tail{i % 2}"})
    ds = rd.from_items(docs).repartition(4)
    # threshold 0.1: capped Jaccard is a LOWER bound (dropped boilerplate
    # shingles leave the union size untouched), so the true pairs land at
    # 3/19 ~ 0.158 under the cap vs 0.85 exact
    full = jaccard_pairs_exact(ds, "doc_id", threshold=0.1).to_pandas()
    capped = jaccard_pairs_exact(ds, "doc_id", threshold=0.1,
                                 max_df=8).to_pandas()
    fk = {(a, b): j for a, b, j in
          zip(full["id_a"], full["id_b"], full["jaccard"])}
    ck = {(a, b): j for a, b, j in
          zip(capped["id_a"], capped["id_b"], capped["jaccard"])}
    # capped pair set is a subset, and every capped Jaccard <= exact
    assert set(ck) <= set(fk)
    for p, j in ck.items():
        assert j <= fk[p] + 1e-12
    # the true near-dup pairs (2i, 2i+1) still survive the cap
    assert {(2 * i, 2 * i + 1) for i in range(15)} <= set(ck)


def test_jaccard_df_cap_empty_result_schema(ray_session):
    """An aggressive cap that drops EVERY posting must still yield a
    typed (id_a, id_b, jaccard) result, not a schemaless empty set."""
    import ray.data as rd
    from geoflow.stages.dedup import jaccard_pairs_exact

    docs = [{"doc_id": i, "text": "same boilerplate everywhere forever"}
            for i in range(20)]
    ds = jaccard_pairs_exact(rd.from_items(docs), "doc_id",
                             threshold=0.1, max_df=1)
    # Ray's to_pandas() drops columns entirely on fully-empty datasets;
    # the operator's contract is the DATASET schema, which the typed
    # seed block guarantees even when every pair is capped away
    assert ds.schema().names == ["id_a", "id_b", "jaccard"]
    assert ds.count() == 0


def test_grouped_count_sum_bucketed_parity(ray_session):
    """The hash-bucketed combine must agree exactly with the Ray-native
    sort-aggregate path on a multi-key, mostly-unique-key input (the
    regime it exists for)."""
    import pandas as pd
    import ray.data as rd
    from geoflow.functions.agg import (grouped_count_sum,
                                       grouped_count_sum_bucketed)

    rng = np.random.default_rng(7)
    n = 20_000
    df = pd.DataFrame({
        "a": rng.integers(0, 40, n),
        "b": rng.integers(0, 40, n),
        "c": rng.integers(0, 7, n),
        "v": rng.integers(-1000, 1000, n),
    })
    ds = rd.from_pandas(df).repartition(8)

    def _norm(out):
        return (out.to_pandas()[["a", "b", "c", "n", "v_sum"]]
                .sort_values(["a", "b", "c"]).reset_index(drop=True)
                .astype(np.int64))

    native = _norm(grouped_count_sum(ds, ["a", "b", "c"], ["v"]))
    bucketed = _norm(grouped_count_sum_bucketed(ds, ["a", "b", "c"],
                                                ["v"], num_buckets=5))
    pd.testing.assert_frame_equal(native, bucketed)
