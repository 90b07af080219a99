"""Link-graph stage: extraction fidelity, degree exactness, and the
integer-PageRank invariants (deterministic replay, dangling-drop)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from geoflow.stages.graph import (PR_SCALE, extract_link_pairs,
                                  link_degrees, pagerank_int,
                                  synth_page_html)


def _expected_edges(n: int) -> set[tuple[int, int]]:
    exp = set()
    for i in range(n):
        for j in range(1, 2 + i % 3):
            t = (i * 31 + j * 977 + 7) % n
            if t != i:
                exp.add((i, t))
    return exp


def _pairs_table(n: int) -> pa.Table:
    ids = np.arange(n, dtype=np.int64)
    return pa.table({"doc_id": pa.array(ids),
                     "html": pa.array(synth_page_html(ids, n))})


def test_extract_recovers_injected_links_exactly():
    tbl = _pairs_table(200)
    out = extract_link_pairs(tbl)
    got = set(zip(out.column("src").to_pylist(),
                  out.column("dst").to_pylist()))
    assert got == _expected_edges(200)


def test_extract_ignores_decoys_and_empty():
    tbl = pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "html": pa.array(["<a href='https://decoy.example/x'>y</a>"
                          '<img src="/l.png"><p>no links</p>']),
    })
    out = extract_link_pairs(tbl)
    assert out.num_rows == 0
    empty = extract_link_pairs(tbl.slice(0, 0))
    assert empty.num_rows == 0 and empty.schema == out.schema


def test_extract_drops_self_links_and_dups():
    tbl = pa.table({
        "doc_id": pa.array([3], pa.int64()),
        "html": pa.array([
            '<a href="https://site3.example/page3.html">self</a>'
            '<a href="https://site9.example/page9.html">a</a>'
            '<a href="https://site9.example/page9.html">again</a>']),
    })
    out = extract_link_pairs(tbl)
    assert (out.column("src").to_pylist(),
            out.column("dst").to_pylist()) == ([3], [9])


def test_degrees_include_zero_degree_nodes():
    n = 120
    docs = rd.from_arrow(_pairs_table(n)).repartition(3)
    pairs = docs.map_batches(extract_link_pairs, batch_format="pyarrow")
    deg = link_degrees(pairs, docs.select_columns(["doc_id"])).to_pandas()
    exp = _expected_edges(n)
    outd: dict[int, int] = {}
    ind: dict[int, int] = {}
    for s, d in exp:
        outd[s] = outd.get(s, 0) + 1
        ind[d] = ind.get(d, 0) + 1
    assert len(deg) == n
    for r in deg.itertuples():
        assert r.out_deg == outd.get(r.doc_id, 0)
        assert r.in_deg == ind.get(r.doc_id, 0)


def _pagerank_reference(edges: set[tuple[int, int]], n: int,
                        iters: int) -> dict[int, int]:
    outd: dict[int, int] = {}
    for s, _ in edges:
        outd[s] = outd.get(s, 0) + 1
    r = {i: PR_SCALE for i in range(n)}
    for _ in range(iters):
        nxt = {i: (15 * PR_SCALE) // 100 for i in range(n)}
        for s, d in edges:
            nxt[d] += (85 * r[s]) // (100 * outd[s])
        r = nxt
    return r


@pytest.mark.parametrize("iters", [1, 3])
def test_pagerank_matches_integer_reference(iters):
    n = 150
    docs = rd.from_arrow(_pairs_table(n)).repartition(3)
    pairs = docs.map_batches(extract_link_pairs, batch_format="pyarrow")
    got = pagerank_int(pairs, docs.select_columns(["doc_id"]),
                       iters=iters, num_buckets=4).to_pandas()
    ref = _pagerank_reference(_expected_edges(n), n, iters)
    assert len(got) == n
    for r in got.itertuples():
        assert int(r.pr) == ref[int(r.doc_id)], r.doc_id


def test_pagerank_dangling_and_isolated_nodes():
    # 0 -> 1, node 2 isolated; node 1 dangles (mass dropped).
    pairs = rd.from_arrow(pa.table({"src": pa.array([0], pa.int64()),
                                    "dst": pa.array([1], pa.int64())}))
    nodes = rd.from_arrow(pa.table({"doc_id": pa.array([0, 1, 2],
                                                       pa.int64())}))
    got = (pagerank_int(pairs, nodes, iters=1, num_buckets=2)
           .to_pandas().set_index("doc_id")["pr"])
    base = (15 * PR_SCALE) // 100
    assert got[0] == base
    assert got[1] == base + (85 * PR_SCALE) // 100
    assert got[2] == base
    total = int(got.sum())
    assert total < 3 * PR_SCALE  # dangling mass really is dropped


def test_degrees_conserve_edge_count():
    n = 90
    docs = rd.from_arrow(_pairs_table(n))
    pairs = docs.map_batches(extract_link_pairs, batch_format="pyarrow")
    deg = link_degrees(pairs, docs.select_columns(["doc_id"])).to_pandas()
    assert deg["out_deg"].sum() == deg["in_deg"].sum() == len(
        _expected_edges(n))


def test_triangle_counts_bruteforce(ray_session):
    """Degree-oriented wedge counting == brute-force enumeration on
    adversarial shapes: K5 (every node in C(4,2)=6 triangles), a
    square with one diagonal, a star (0 triangles), duplicate and
    reversed input edges."""
    import itertools

    import pandas as pd
    import ray.data as rd

    from geoflow.stages.graph import triangle_node_counts

    edges = []
    k5 = [100, 101, 102, 103, 104]
    edges += list(itertools.combinations(k5, 2))
    edges += [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]   # square+diag
    edges += [(50, i) for i in range(60, 70)]           # star
    edges += [(2, 1), (3, 1)]                           # dupes/reversed
    df = pd.DataFrame(edges, columns=["src", "dst"])
    got = triangle_node_counts(rd.from_pandas(df)).to_pandas()
    got = dict(zip(got["node"], got["n_tri"]))

    und = {tuple(sorted(e)) for e in edges}
    nodes = sorted({n for e in und for n in e})
    want = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= und:
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1
    assert got == want
    assert got[100] == 6 and got[1] == 2 and 50 not in got


def test_coreness_matches_sequential_peel(ray_session):
    """H-index iteration == Matula-Beck min-degree peel on a random
    graph plus a planted K5 (core 4) and a path (core 1)."""
    import itertools

    import pandas as pd
    import ray.data as rd

    from geoflow.stages.graph import (coreness_iterative,
                                      coreness_reference)

    rng = np.random.default_rng(3)
    edges = [(int(a), int(b))
             for a, b in rng.integers(0, 60, (300, 2)) if a != b]
    edges += list(itertools.combinations(range(100, 105), 2))
    edges += [(200, 201), (201, 202), (202, 203)]
    got = coreness_iterative(
        rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    ).to_pandas()
    got = dict(zip(got["node"], got["core"]))
    want = coreness_reference(edges)
    assert got == want
    assert all(want[n] == 4 for n in range(100, 105))
    assert want[200] == 1 and want[203] == 1


def test_extract_anchor_texts_exact():
    from geoflow.stages.graph import extract_anchor_texts

    n = 150
    tbl = _pairs_table(n)
    out = extract_anchor_texts(tbl)
    got = set(zip(out.column("src").to_pylist(),
                  out.column("dst").to_pylist(),
                  out.column("anchor").to_pylist()))
    exp = set()
    for i in range(n):
        for j in range(1, 2 + i % 3):
            t = (i * 31 + j * 977 + 7) % n
            if t != i:
                exp.add((i, t, f"go {t} ref{j}"))
    assert got == exp
    # empty input round-trips
    assert len(extract_anchor_texts(tbl.slice(0, 0))) == 0


def test_mutual_edges_exact(ray_session):
    import ray.data as rd
    from geoflow.stages.graph import mutual_edges

    e = np.array([[1, 2], [2, 1], [3, 4], [4, 3], [5, 6], [7, 1],
                  [2, 7]])
    pairs = rd.from_arrow(pa.table({
        "src": pa.array(e[:, 0], pa.int64()),
        "dst": pa.array(e[:, 1], pa.int64())}))
    out = mutual_edges(pairs).to_pandas().drop_duplicates()
    got = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    # only 1<->2 and 3<->4 are reciprocated; 5->6, 7->1, 2->7 are not
    assert got == {(1, 2), (3, 4)}
