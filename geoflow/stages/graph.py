"""Web link graph: anchor extraction, degrees, integer PageRank.

A web-scale corpus is a graph, and the curation loop needs graph
signal: in-degree as a popularity prior, PageRank for spam-resistant
sampling weights, out-degree for boilerplate/link-farm filters. This
module provides the three primitives Ray-Data-first:

- ``extract_links``: whole-column Arrow kernel chain (split_pattern ->
  list_flatten -> extract_regex) that recovers ``<a href="...">``
  targets from raw HTML — no Python-level per-row regex loop. Pages
  keep their links inside one row, so per-page target dedup and
  self-link drops stay batch-local (no shuffle).
- ``link_degrees``: out/in-degree in ONE groupby shuffle via the
  union-of-slim-emissions idiom (each edge contributes two 24-byte
  rows, each node a zero seed) — the same shape as the exact-dedup
  bucket plan (see flagship.py).
- ``pagerank_int``: damped PageRank in EXACT int64 arithmetic —
  contribution = (85 * r) // (100 * outdeg), base = 0.15 * S — so a
  DuckDB replay of the same chained iterations hash-matches bit for
  bit (no float summation-order noise). Dangling mass is dropped
  (documented variant; deterministic). Each iteration is one bucketed
  hash join (rank -> edges on src) plus one groupby-sum on dst: the
  10^12-edge plan, nothing corpus-sized ever sits on the driver.

SCALE: rank and edge tables shuffle bucket-keyed exactly like
functions.joins.bucketed_hash_join everywhere else in the engine; at
100 TB the edge table is materialized once (it is re-probed every
iteration) and iterations stream rank blocks through the object
store. Iteration count is fixed (a hyperparameter), so the whole
computation is a static pipeline of K joins — no driver-side graph
state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

PR_SCALE = 10**12          # integer mass per node at iteration 0
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100


# Per-round block hygiene for iterative BSP loops (see functions.agg).
from ..functions.agg import coalesce_blocks as _coalesce  # noqa: E402
from ..functions.agg import iter_cap as _iter_cap  # noqa: E402


def synth_page_html(ids: np.ndarray, n_docs: int) -> list[str]:
    """Deterministic anchor-tag HTML per doc_id: doc i carries
    1 + i % 3 links to (i*31 + j*977 + 7) % n_docs, j = 1..d, wrapped
    in decoy markup (class attributes, an unquoted href, an img tag)
    the extractor must ignore. The oracle recomputes the targets from
    doc_id arithmetic alone, so a hash match proves the extractor
    recovers exactly the injected links."""
    pages = []
    for i in ids.tolist():
        d = 1 + i % 3
        anchors = "".join(
            f'<a class="l{j}" href="https://site{t}.example/page{t}.html">'
            f"go {t} ref{j}</a><p>filler {i}</p>"
            for j in range(1, d + 1)
            for t in [(i * 31 + j * 977 + 7) % n_docs])
        pages.append(
            f'<html><body><img src="/logo{i}.png">'
            f"<a href='https://decoy.example/unquoted'>x</a>"
            f"{anchors}</body></html>")
    return pages


_LINK_RE = r'^https://site[0-9]+\.example/page(?P<t>[0-9]+)\.html"'


def extract_link_pairs(batch: pa.Table, html_col: str = "html",
                       id_col: str = "doc_id") -> pa.Table:
    """(src, dst) link pairs from an HTML column, fully Arrow-side.

    split_pattern('href="') turns each page into a list of fragments;
    every fragment except the first starts with a candidate URL, which
    a single anchored extract_regex over the FLAT child array parses.
    Non-matching candidates (single-quoted decoys never split; foreign
    hosts fail the anchor) drop out as nulls. Per-page target dedup +
    self-link removal happen inside the batch — a page's links live in
    one row, so no cross-batch state is needed."""
    empty = pa.table({"src": pa.array([], pa.int64()),
                      "dst": pa.array([], pa.int64())})
    if len(batch) == 0:
        return empty
    ids = batch.column(id_col).to_numpy().astype(np.int64)
    s = pc.cast(batch.column(html_col), pa.large_string())
    parts = pc.split_pattern(s, 'href="')
    flat = pc.list_flatten(parts)
    parents = pc.list_parent_indices(parts).to_numpy().astype(np.int64)
    if len(parents) == 0:
        return empty
    # drop each row's fragment 0 (text before the first href=")
    keep = np.ones(len(parents), dtype=bool)
    keep[np.r_[True, parents[1:] != parents[:-1]]] = False
    m = pc.extract_regex(pc.take(flat, pa.array(np.flatnonzero(keep))),
                         _LINK_RE)
    tgt = pc.struct_field(m, "t")
    par = parents[keep]
    ok = pc.is_valid(tgt).to_numpy(zero_copy_only=False)
    src = ids[par[ok]]
    dst = pc.cast(pc.drop_null(tgt), pa.int64()).to_numpy()
    df = pd.DataFrame({"src": src, "dst": dst})
    df = df[df["src"] != df["dst"]].drop_duplicates()
    return pa.table({"src": pa.array(df["src"].to_numpy(), pa.int64()),
                     "dst": pa.array(df["dst"].to_numpy(), pa.int64())})


def link_degrees(pairs_ds, nodes_ds, id_col: str = "doc_id"):
    """Per-node (out_deg, in_deg) including zero-degree nodes, in ONE
    groupby shuffle: each edge emits two slim counter rows, each node
    a zero seed, then groupby(id).sum on both counters."""
    from ray.data.aggregate import Sum

    def _emit(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy()
        d = b.column("dst").to_numpy()
        one = np.ones(len(s), dtype=np.int64)
        zero = np.zeros(len(s), dtype=np.int64)
        return pa.table({
            id_col: pa.array(np.concatenate([s, d]), pa.int64()),
            "_o": pa.array(np.concatenate([one, zero])),
            "_i": pa.array(np.concatenate([zero, one])),
        })

    def _seed(b: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(len(b), dtype=np.int64))
        return pa.table({id_col: pc.cast(b.column(id_col), pa.int64()),
                         "_o": z, "_i": z})

    emitted = pairs_ds.map_batches(_emit, batch_format="pyarrow").union(
        nodes_ds.map_batches(_seed, batch_format="pyarrow"))
    agg = emitted.groupby(id_col).aggregate(
        Sum("_o", alias_name="out_deg"), Sum("_i", alias_name="in_deg"))
    return agg.map_batches(
        lambda b: pa.table({
            id_col: pc.cast(b.column(id_col), pa.int64()),
            "out_deg": pc.cast(b.column("out_deg"), pa.int64()),
            "in_deg": pc.cast(b.column("in_deg"), pa.int64()),
        }), batch_format="pyarrow")


def pagerank_int(pairs_ds, nodes_ds, id_col: str = "doc_id",
                 iters: int = 4, scale: int = PR_SCALE,
                 num_buckets: int | None = None, seed_pred=None):
    """Damped PageRank over ``iters`` fixed iterations in exact int64.

    r_0[v] = scale;  r_{k+1}[v] = (15*scale)//100
                     + sum_{u->v} (85 * r_k[u]) // (100 * outdeg[u])

    ``seed_pred`` (vectorized ids -> bool mask) switches to
    PERSONALIZED PageRank / random-walk-with-restart: the teleport
    base (and the initial mass) go ONLY to seed nodes —
    r_0[v] = scale if seed else 0, base term likewise — so ranks
    measure proximity to the seed set (graph-local relevance for
    curation sampling). Identical plan, identical SQL-replayability
    (the oracle's base becomes a CASE on the seed predicate).

    Dangling nodes simply stop forwarding mass (dropped, not
    redistributed) — a deterministic, SQL-replayable variant. Every
    quantity is int64 (scale=1e12, contributions sum to < n * scale;
    callers at n > ~9e5 nodes should lower ``scale`` accordingly or
    accept the DuckDB HUGEINT headroom the oracle uses).

    Plan per iteration: bucketed hash join of the CURRENT rank table
    onto the (src, dst, outdeg)-materialized edge table, a vectorized
    contribution map, then one groupby(dst).sum unioned with zero
    seeds so isolated nodes keep their base rank. Ranks materialize
    per iteration to cut lineage (same idiom as
    stages.dedup._dup_components_distributed)."""
    from ray.data.aggregate import Count, Sum

    from ..functions.joins import bucketed_hash_join

    base = (15 * scale) // PR_DAMP_DEN

    od = pairs_ds.groupby("src").aggregate(Count(alias_name="_od"))
    edges = bucketed_hash_join(
        pairs_ds, od.map_batches(
            lambda b: pa.table({"_osrc": pc.cast(b.column("src"), pa.int64()),
                                "_od": pc.cast(b.column("_od"), pa.int64())}),
            batch_format="pyarrow"),
        "src", "_osrc", num_buckets=num_buckets)
    # edges: (_key=src, dst, _od)
    edges = edges.map_batches(
        lambda b: pa.table({"_esrc": pc.cast(b.column("_key"), pa.int64()),
                            "dst": pc.cast(b.column("dst"), pa.int64()),
                            "_od": pc.cast(b.column("_od"), pa.int64())}),
        batch_format="pyarrow").materialize()

    def _seed(b: pa.Table) -> pa.Table:
        return pa.table({
            "dst": pc.cast(b.column(id_col), pa.int64()),
            "_m": pa.array(np.zeros(len(b), dtype=np.int64))})

    seeds = nodes_ds.map_batches(_seed, batch_format="pyarrow").materialize()

    def _init(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy().astype(np.int64)
        r0 = (np.where(seed_pred(ids), scale, 0) if seed_pred is not None
              else np.full(len(ids), scale)).astype(np.int64)
        return pa.table({"_rid": pa.array(ids),
                         "_r": pa.array(r0, pa.int64())})

    ranks = nodes_ds.map_batches(_init,
                                 batch_format="pyarrow").materialize()
    cap = _iter_cap(ranks)

    def _contrib(b: pa.Table) -> pa.Table:
        r = b.column("_r").to_numpy()
        odv = b.column("_od").to_numpy()
        m = (PR_DAMP_NUM * r) // (PR_DAMP_DEN * odv)
        return pa.table({"dst": b.column("dst"),
                         "_m": pa.array(m, pa.int64())})

    for _ in range(iters):
        heard = bucketed_hash_join(edges, ranks, "_esrc", "_rid",
                                   num_buckets=num_buckets)
        contrib = heard.map_batches(_contrib, batch_format="pyarrow")
        summed = contrib.union(seeds).groupby("dst").aggregate(
            Sum("_m", alias_name="_s"))
        def _rank(b: pa.Table) -> pa.Table:
            rid = b.column("dst").to_numpy().astype(np.int64)
            b_arr = (np.where(seed_pred(rid), base, 0)
                     if seed_pred is not None
                     else np.full(len(rid), base)).astype(np.int64)
            return pa.table({
                "_rid": pa.array(rid),
                "_r": pa.array(b_arr + b.column("_s").to_numpy()
                               .astype(np.int64), pa.int64())})

        ranks = _coalesce(summed.map_batches(
            _rank, batch_format="pyarrow"), cap).materialize()

    return ranks.map_batches(
        lambda b: pa.table({id_col: b.column("_rid"),
                            "pr": b.column("_r")}),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Triangle counting (degree-oriented compact-forward)
# ---------------------------------------------------------------------------

_NODE_BITS = 31   # packed pair key = a * 2^31 + b; node ids < 2^31


def _pack(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a * np.int64(1 << _NODE_BITS) + b


def triangle_node_counts(pairs_ds, num_buckets: int = 64):
    """(doc_id, n_tri) for every node in >= 1 triangle.

    Degree-oriented wedge counting (Latapy's compact-forward): the
    undirected edge set is oriented from the (degree, id)-SMALLER
    endpoint to the larger, so every out-adjacency has O(sqrt(m))
    size and every triangle is generated exactly once as a wedge at
    its smallest vertex closed by one oriented edge.

    Plan: symmetrize+dedup (one bucketed groupby), attach both
    endpoint degrees (two bucketed joins), explode wedges per apex
    (vectorized triu inside hash buckets), ONE bucketed semi-join of
    wedge keys against oriented-edge keys, then a counter groupby per
    node. Everything moves as slim int64 rows.
    """
    import pandas as pd
    import pyarrow as pa

    from ..functions.agg import grouped_count_sum_bucketed
    from ..functions.joins import _mix64, bucketed_hash_join

    # 1) undirected distinct edges u < v (self-loops already dropped).
    # Edge keys are near-unique -> the bucketed Arrow combine, not
    # Ray's per-key sort-aggregate (measured ~25x on this regime).
    def _undirect(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy().astype(np.int64)
        d = b.column("dst").to_numpy().astype(np.int64)
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        return pa.table({"ek": pa.array(_pack(u, v), pa.int64())})

    edges = grouped_count_sum_bucketed(
        pairs_ds.map_batches(_undirect, batch_format="pyarrow"),
        ["ek"], [], count_alias="_m")

    def _unpack(b: pa.Table) -> pa.Table:
        ek = b.column("ek").to_numpy().astype(np.int64)
        return pa.table({
            "u": pa.array(ek >> _NODE_BITS, pa.int64()),
            "v": pa.array(ek & np.int64((1 << _NODE_BITS) - 1),
                          pa.int64())})

    ue = edges.map_batches(_unpack, batch_format="pyarrow") \
        .materialize()

    # 2) degrees over the undirected set
    def _deg_emit(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy()
        v = b.column("v").to_numpy()
        return pa.table({"node": pa.array(np.concatenate([u, v]),
                                          pa.int64())})

    deg = grouped_count_sum_bucketed(
        ue.map_batches(_deg_emit, batch_format="pyarrow"),
        ["node"], [], count_alias="deg")

    # attach deg(u), deg(v) via two bucketed joins (degree tables are
    # node-sized — joined, never broadcast)
    j1 = bucketed_hash_join(
        ue, deg.map_batches(
            lambda b: pa.table({"nu": b.column("node"),
                                "du": pa.compute.cast(b.column("deg"),
                                                      pa.int64())}),
            batch_format="pyarrow"), "u", "nu")

    def _rk1(b: pa.Table) -> pa.Table:
        return pa.table({"u": b.column("_key"), "v": b.column("v"),
                         "du": b.column("du")})

    j2 = bucketed_hash_join(
        j1.map_batches(_rk1, batch_format="pyarrow"),
        deg.map_batches(
            lambda b: pa.table({"nv": b.column("node"),
                                "dv": pa.compute.cast(b.column("deg"),
                                                      pa.int64())}),
            batch_format="pyarrow"), "v", "nv")

    # 3) orient: from (deg, id)-smaller to larger; key on the apex
    def _orient(b: pa.Table) -> pa.Table:
        v = b.column("_key").to_numpy().astype(np.int64)
        u = b.column("u").to_numpy().astype(np.int64)
        du = b.column("du").to_numpy().astype(np.int64)
        dv = b.column("dv").to_numpy().astype(np.int64)
        fwd = (du < dv) | ((du == dv) & (u < v))
        a = np.where(fwd, u, v)
        z = np.where(fwd, v, u)
        return pa.table({"apex": pa.array(a, pa.int64()),
                         "out": pa.array(z, pa.int64())})

    oriented = j2.map_batches(_orient, batch_format="pyarrow") \
        .materialize()

    # 4) wedges per apex (sorted out-lists, vectorized triu per apex)
    def _bucket(b: pa.Table) -> pa.Table:
        a = b.column("apex").to_numpy().astype(np.int64)
        return b.append_column(
            "_b", pa.array((_mix64(a) % np.uint64(num_buckets))
                           .astype(np.int32)))

    def _wedges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["apex", "out"], kind="stable")
        a = g["apex"].to_numpy()
        o = g["out"].to_numpy()
        starts = np.nonzero(np.append(True, a[1:] != a[:-1]))[0]
        ends = np.append(starts[1:], len(a))
        ap_out, w1, w2 = [], [], []
        for s, e in zip(starts, ends):
            k = e - s
            if k < 2:
                continue
            i, j = np.triu_indices(k, k=1)
            ap_out.append(np.full(len(i), a[s]))
            w1.append(o[s + i])
            w2.append(o[s + j])
        if not ap_out:
            return pd.DataFrame({"apex": np.array([], np.int64),
                                 "wk": np.array([], np.int64)})
        ap = np.concatenate(ap_out)
        x = np.concatenate(w1)
        y = np.concatenate(w2)
        # out-lists are sorted by id; orientation order is (deg, id),
        # so normalize the closing key to (min, max) by id — the
        # oriented edge (x, y) is keyed the same way below
        return pd.DataFrame({"apex": ap,
                             "wk": _pack(np.minimum(x, y),
                                         np.maximum(x, y))})

    wedges = (oriented.map_batches(_bucket, batch_format="pyarrow")
              .groupby("_b").map_groups(_wedges, batch_format="pandas"))

    # 5) close wedges against oriented edges keyed by id-(min, max)
    def _ekey(b: pa.Table) -> pa.Table:
        a = b.column("apex").to_numpy().astype(np.int64)
        z = b.column("out").to_numpy().astype(np.int64)
        return pa.table({"wk2": pa.array(_pack(np.minimum(a, z),
                                               np.maximum(a, z)),
                                         pa.int64())})

    closed = bucketed_hash_join(
        wedges, oriented.map_batches(_ekey, batch_format="pyarrow"),
        "wk", "wk2")

    # 6) each triangle: apex + the closing edge's two endpoints
    def _nodes(b: pa.Table) -> pa.Table:
        ap = b.column("apex").to_numpy().astype(np.int64)
        wk = b.column("_key").to_numpy().astype(np.int64)
        x = wk >> _NODE_BITS
        y = wk & np.int64((1 << _NODE_BITS) - 1)
        return pa.table({"node": pa.array(
            np.concatenate([ap, x, y]), pa.int64())})

    return grouped_count_sum_bucketed(
        closed.map_batches(_nodes, batch_format="pyarrow"),
        ["node"], [], count_alias="n_tri")


# ---------------------------------------------------------------------------
# Core decomposition (distributed h-index iteration)
# ---------------------------------------------------------------------------


def coreness_iterative(pairs_ds, num_buckets: int = 64,
                       max_rounds: int = 10_000):
    """(node, core) for every node of the undirected graph.

    Distributed coreness by h-index iteration (Lu et al. 2016): start
    from c(v) = deg(v) and repeatedly set c(v) to the H-index of its
    neighbors' current values; the sequence is monotone non-increasing
    and its unique fixpoint is the core number. Each round is two
    bucket shuffles — ship every node's current value along its edges
    (bucketed by the neighbor), then a per-node vectorized H-index —
    the synchronous label-correcting posture of stages/costdist, on
    graphs. Verified against an independent sequential Matula-Beck
    min-degree peel (different algorithm and order; core numbers are
    unique).
    """
    import pandas as pd
    import pyarrow as pa

    from ..functions.agg import grouped_count_sum_bucketed
    from ..functions.joins import _mix64

    def _undirect(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy().astype(np.int64)
        d = b.column("dst").to_numpy().astype(np.int64)
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        return pa.table({"ek": pa.array(_pack(u, v), pa.int64())})

    edges = grouped_count_sum_bucketed(
        pairs_ds.map_batches(_undirect, batch_format="pyarrow"),
        ["ek"], [], count_alias="_m")

    # adjacency in both directions, bucketed by the VALUE OWNER (nbr)
    # so stage A can stamp each edge with its neighbor's current value
    def _both(b: pa.Table) -> pa.Table:
        ek = b.column("ek").to_numpy().astype(np.int64)
        u = ek >> _NODE_BITS
        v = ek & np.int64((1 << _NODE_BITS) - 1)
        node = np.concatenate([u, v])     # receiver of the value
        nbr = np.concatenate([v, u])      # owner of the value
        return pa.table({
            "node": pa.array(node, pa.int64()),
            "nbr": pa.array(nbr, pa.int64()),
            "c": pa.array(np.full(len(node), -1, np.int64)),
            "_b": pa.array((_mix64(nbr) % np.uint64(num_buckets))
                           .astype(np.int32))})

    adj = edges.map_batches(_both, batch_format="pyarrow").materialize()

    cur = grouped_count_sum_bucketed(
        adj.map_batches(lambda b: b.select(["node"]),
                        batch_format="pyarrow"),
        ["node"], [], count_alias="c").materialize()
    cap = _iter_cap(cur)

    def _attach(g: pd.DataFrame) -> pd.DataFrame:
        vals = g[g["nbr"] < 0]
        cmap = dict(zip(vals["node"].to_numpy(),
                        vals["c"].to_numpy()))
        a = g[g["nbr"] >= 0]
        out = pd.DataFrame({
            "node": a["node"].to_numpy(),
            "c": np.array([cmap[x] for x in a["nbr"].to_numpy()],
                          np.int64),
            "own": np.zeros(len(a), np.int64)})
        own = pd.DataFrame({
            "node": vals["node"].to_numpy(),
            "c": vals["c"].to_numpy().astype(np.int64),
            "own": np.ones(len(vals), np.int64)})
        return pd.concat([out, own], ignore_index=True)

    def _hindex(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["node", "own"], kind="stable")
        nodes = g["node"].to_numpy()
        cs = g["c"].to_numpy()
        owns = g["own"].to_numpy()
        starts = np.nonzero(np.append(True, nodes[1:] != nodes[:-1]))[0]
        ends = np.append(starts[1:], len(nodes))
        out_n, out_c, out_ch = [], [], []
        for s, e in zip(starts, ends):
            old = int(cs[e - 1])          # own row sorts last
            nv = np.sort(cs[s:e - 1])[::-1]
            k = np.arange(1, len(nv) + 1)
            h = int(np.max(np.minimum(nv, k))) if len(nv) else 0
            out_n.append(int(nodes[s]))
            out_c.append(h)
            out_ch.append(h != old)
        return pd.DataFrame({"node": np.array(out_n, np.int64),
                             "c": np.array(out_c, np.int64),
                             "changed": np.array(out_ch)})

    for _ in range(max_rounds):
        vals_a = cur.map_batches(
            lambda b: pa.table({
                "node": pc.cast(b.column("node"), pa.int64()),
                "nbr": pa.array(np.full(b.num_rows, -1, np.int64)),
                "c": pc.cast(b.column("c"), pa.int64()),
                "_b": pa.array((_mix64(b.column("node").to_numpy()
                                       .astype(np.int64))
                                % np.uint64(num_buckets))
                               .astype(np.int32))}),
            batch_format="pyarrow")
        shipped = (adj.union(vals_a).groupby("_b")
                   .map_groups(_attach, batch_format="pandas"))

        def _rebucket(b: pa.Table) -> pa.Table:
            n = b.column("node").to_numpy().astype(np.int64)
            return b.append_column(
                "_b2", pa.array((_mix64(n) % np.uint64(num_buckets))
                                .astype(np.int32)))

        nxt = _coalesce(
            shipped.map_batches(_rebucket, batch_format="pyarrow")
            .groupby("_b2").map_groups(_hindex, batch_format="pandas"),
            cap).materialize()
        changed = nxt.map_batches(
            lambda b: pa.table({"ch": pa.array(
                [int(np.asarray(b.column("changed")).sum())],
                pa.int64())}), batch_format="pyarrow").to_pandas()
        cur = nxt.drop_columns(["changed"]).materialize()
        if int(changed["ch"].sum()) == 0:
            break
    else:
        raise RuntimeError(
            f"coreness did not converge within {max_rounds} rounds")
    return cur.map_batches(
        lambda b: pa.table({"node": pc.cast(b.column("node"), pa.int64()),
                            "core": pc.cast(b.column("c"), pa.int64())}),
        batch_format="pyarrow")


def coreness_reference(edges: list[tuple[int, int]]) -> dict:
    """Independent oracle: sequential Matula-Beck min-degree peel
    (core(v) = the running max of removal degrees when v is peeled)."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    deg = {n: len(v) for n, v in adj.items()}
    alive = set(adj)
    core = {}
    k = 0
    while alive:
        n = min(alive, key=lambda x: (deg[x], x))
        k = max(k, deg[n])
        core[n] = k
        alive.remove(n)
        for m in adj[n]:
            if m in alive:
                deg[m] -= 1
    return core


# ---------------------------------------------------------------------------
# BFS hop distance (single-source/multi-seed shortest paths, unit weights)
# ---------------------------------------------------------------------------

BFS_INF = 1_000_000


def bfs_hops(pairs_ds, nodes_ds, seed_pred, rounds: int = 8,
             id_col: str = "doc_id", num_buckets: int | None = None):
    """Multi-seed BFS over the directed link graph by synchronous
    Bellman-Ford rounds (unit edge weights):

        d_0[v]   = 0 if seed else INF
        d_{k+1}[v] = min(d_k[v], min over edges u->v of d_k[u] + 1)

    After ``rounds`` rounds every node within ``rounds`` hops of a seed
    carries its exact hop distance (the relaxation is monotone, so
    extra rounds are no-ops for converged nodes). Returns (id_col,
    hops) for reached nodes only.

    Plan per round — identical shape to pagerank_int: ONE bucketed
    hash join of the round-k FRONTIER (nodes settled at distance k —
    relaxing from older nodes would only re-emit settled candidates)
    onto the materialized edge table, a vectorized d+1 map, then ONE
    bucketed Arrow groupby-min over the union of old distances and new
    candidates. Distances materialize per round to cut lineage.
    ``seed_pred``: vectorized ids -> bool mask (kept SQL-replayable by
    callers).

    SCALE: per-round shuffle volume = reached-edge contributions
    (16 B/row) + the node-sized distance table; rounds is a fixed small
    constant (web graphs: effective diameter ~6-8). A 10^12-edge graph
    pays `rounds` bucketed joins — the standard iterative-BSP cost —
    with no driver-side state beyond the loop counter.
    """
    from ..functions.joins import _mix64, bucketed_hash_join

    edges = pairs_ds.map_batches(
        lambda b: pa.table({"_esrc": pc.cast(b.column("src"), pa.int64()),
                            "dst": pc.cast(b.column("dst"), pa.int64())}),
        batch_format="pyarrow").materialize()

    def _seed(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy().astype(np.int64)
        d = np.where(seed_pred(ids), 0, BFS_INF).astype(np.int64)
        return pa.table({"_nid": pa.array(ids), "_d": pa.array(d)})

    dist = nodes_ds.map_batches(_seed, batch_format="pyarrow").materialize()
    cap = _iter_cap(dist)

    def _frontier(k: int):
        # unit weights => nodes settled in round k all carry d == k, so
        # the next round only needs to relax from THEM (relaxing from
        # older nodes re-emits already-settled candidates).
        def _f(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b.column("_d"), pa.scalar(k)))
        return _f

    def _relax(b: pa.Table) -> pa.Table:
        return pa.table({
            "_nid": pc.cast(b.column("dst"), pa.int64()),
            "_d": pa.array(b.column("_d").to_numpy() + 1, pa.int64())})

    # min-combine via the bucketed Arrow hash-aggregate (the od_two_hop
    # idiom): batch-local pre-min + bucket tag, then ONE Arrow group-by
    # per bucket — measured far cheaper than Ray's per-key
    # sort-aggregate on near-unique node keys.
    nb = np.uint64(num_buckets or 32)

    def _premin(b: pa.Table) -> pa.Table:
        t = pa.TableGroupBy(b, "_nid").aggregate([("_d", "min")])
        nid = t.column("_nid").to_numpy().astype(np.int64)
        return pa.table({
            "_nid": pa.array(nid),
            "_d": pc.cast(t.column("_d_min"), pa.int64()),
            "_b": pa.array((_mix64(nid) % nb).astype(np.int32))})

    def _minbucket(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, "_nid").aggregate([("_d", "min")])
        return pa.table({"_nid": pc.cast(g.column("_nid"), pa.int64()),
                         "_d": pc.cast(g.column("_d_min"), pa.int64())})

    for k in range(rounds):
        frontier = dist.map_batches(_frontier(k), batch_format="pyarrow")
        heard = bucketed_hash_join(edges, frontier, "_esrc", "_nid",
                                   num_buckets=num_buckets)
        cand = heard.map_batches(_relax, batch_format="pyarrow")
        dist = _coalesce(dist.union(cand)
                         .map_batches(_premin, batch_format="pyarrow")
                         .groupby("_b").map_groups(_minbucket,
                                                   batch_format="pyarrow"),
                         cap).materialize()

    def _final(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(b.column("_d"), pa.scalar(BFS_INF)))
        return pa.table({id_col: b.column("_nid"), "hops": b.column("_d")})

    return dist.map_batches(_final, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# HITS hubs / authorities (exact int64, max-normalized per half-round)
# ---------------------------------------------------------------------------

HITS_SCALE = 10**6


def hits_int(pairs_ds, nodes_ds, id_col: str = "doc_id",
             iters: int = 2, scale: int = HITS_SCALE,
             num_buckets: int | None = None):
    """HITS (Kleinberg) hub/authority scores in EXACT int64 arithmetic.

    Per iteration:  a_raw[v] = sum_{u->v} h[u];  a = a_raw*S // max(a_raw)
                    h_raw[u] = sum_{u->v} a[v];  h = h_raw*S // max(h_raw)
    starting from h_0 = S everywhere. The usual L2 normalization is
    replaced by integer max-normalization so a chained-CTE DuckDB
    replay (HUGEINT sums, `//` floor division) hash-matches bit for
    bit. Headroom: values stay <= S after each normalization, so the
    pre-normalization sums need in-degree * S < 2^63 — callers at
    in-degree beyond ~9e12/S should lower ``scale`` (same documented
    trade as ``pagerank_int``).

    Plan per half-round — the pagerank shape: ONE bucketed hash join
    of the current score table onto the materialized edge table, then
    ONE bucketed grouped sum; the normalizing max is a scalar
    aggregate (driver holds one int). Zero-score nodes (no in/out
    links) drop out of the iterate — they contribute nothing — and are
    restored as 0 rows in the final full outer union against the node
    table. Score tables coalesce between rounds (block-growth hygiene,
    see functions.agg.coalesce_blocks).

    Returns (id_col, hub, auth) for EVERY node.
    """
    from ray.data.aggregate import Max

    from ..functions.agg import (coalesce_blocks,
                                 grouped_count_sum_bucketed, iter_cap)
    from ..functions.joins import bucketed_hash_join

    edges = pairs_ds.map_batches(
        lambda b: pa.table({"_esrc": pc.cast(b.column("src"), pa.int64()),
                            "_edst": pc.cast(b.column("dst"), pa.int64())}),
        batch_format="pyarrow").materialize()

    hub = nodes_ds.map_batches(
        lambda b: pa.table({
            "_sid": pc.cast(b.column(id_col), pa.int64()),
            "_s": pa.array(np.full(len(b), scale, np.int64))}),
        batch_format="pyarrow").materialize()
    cap = iter_cap(hub)
    auth = None

    def _half(score_ds, join_key: str, emit_key: str):
        """score on join_key flows across edges to emit_key; grouped
        sum; max-normalize to [0, scale]."""
        heard = bucketed_hash_join(edges, score_ds, join_key, "_sid",
                                   num_buckets=num_buckets)
        flowed = heard.map_batches(
            lambda b: pa.table({"_sid": pc.cast(b.column(emit_key),
                                                pa.int64()),
                                "_s": pc.cast(b.column("_s"), pa.int64())}),
            batch_format="pyarrow")
        raw = coalesce_blocks(
            grouped_count_sum_bucketed(flowed, ["_sid"], ["_s"]),
            cap).map_batches(
            lambda b: pa.table({"_sid": b.column("_sid"),
                                "_s": pc.cast(b.column("_s_sum"),
                                              pa.int64())}),
            batch_format="pyarrow").materialize()
        mx = max(int(raw.aggregate(Max("_s"))["max(_s)"] or 0), 1)
        if mx > (2 ** 63 - 1) // scale:
            # s * scale would wrap silently in numpy int64 while the
            # DuckDB oracle computes in HUGEINT — fail loudly instead
            raise OverflowError(
                f"hits normalization overflow: max score {mx} * scale "
                f"{scale} exceeds int64; lower the score scale")

        def _norm(b: pa.Table) -> pa.Table:
            s = b.column("_s").to_numpy()
            return pa.table({"_sid": b.column("_sid"),
                             "_s": pa.array(s * scale // mx, pa.int64())})
        return raw.map_batches(_norm, batch_format="pyarrow").materialize()

    for _ in range(iters):
        auth = _half(hub, "_esrc", "_edst")     # hubs endorse authorities
        hub = _half(auth, "_edst", "_esrc")     # authorities credit hubs

    def _tag(col: str, src):
        return src.map_batches(
            lambda b: pa.table({
                "_sid": pc.cast(b.column("_sid"), pa.int64()),
                "hub": pc.cast(b.column("_s"), pa.int64())
                if col == "hub" else pa.array(np.zeros(len(b), np.int64)),
                "auth": pc.cast(b.column("_s"), pa.int64())
                if col == "auth" else pa.array(np.zeros(len(b), np.int64)),
            }), batch_format="pyarrow")

    zeros = nodes_ds.map_batches(
        lambda b: pa.table({
            "_sid": pc.cast(b.column(id_col), pa.int64()),
            "hub": pa.array(np.zeros(len(b), np.int64)),
            "auth": pa.array(np.zeros(len(b), np.int64))}),
        batch_format="pyarrow")
    both = _tag("hub", hub).union(_tag("auth", auth)).union(zeros)
    summed = grouped_count_sum_bucketed(both, ["_sid"], ["hub", "auth"])
    return summed.map_batches(
        lambda b: pa.table({id_col: b.column("_sid"),
                            "hub": pc.cast(b.column("hub_sum"), pa.int64()),
                            "auth": pc.cast(b.column("auth_sum"),
                                            pa.int64())}),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Weighted shortest paths (bounded Bellman-Ford rounds, exact int64)
# ---------------------------------------------------------------------------

def sssp_rounds(pairs_ds, nodes_ds, seed_pred, weight_fn,
                rounds: int = 8, id_col: str = "doc_id",
                num_buckets: int | None = None):
    """Multi-seed single-source shortest paths with integer edge
    weights, by ``rounds`` synchronous Bellman-Ford relaxations:

        d_0[v]     = 0 if seed else INF
        d_{k+1}[v] = min(d_k[v], min_{u->v} d_k[u] + w(u, v))

    After K rounds d[v] is EXACTLY the weight of the cheapest path
    using <= K edges — a well-defined quantity a chained-CTE DuckDB
    replay reproduces bit for bit (all int64). Unlike ``bfs_hops``,
    a node's distance can improve in later rounds (a longer-hop but
    cheaper path), so every reached node relaxes every round — the
    frontier is d < INF, not d == k.

    ``weight_fn(src, dst) -> int64 ndarray`` must be vectorized and
    deterministic (callers keep it SQL-replayable). Weights are
    attached to the edge table ONCE at materialization, not per round.

    SCALE: per-round cost = one bucketed hash join of the reached
    distance table onto the edge table + one bucketed groupby-min —
    identical to the BFS plan; rounds is a fixed small constant.
    Distance tables coalesce between rounds (block-growth hygiene).
    """
    from ..functions.joins import _mix64, bucketed_hash_join

    def _edge(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy().astype(np.int64)
        d = b.column("dst").to_numpy().astype(np.int64)
        return pa.table({"_esrc": pa.array(s),
                         "dst": pa.array(d),
                         "_w": pa.array(weight_fn(s, d)
                                        .astype(np.int64))})

    edges = pairs_ds.map_batches(_edge,
                                 batch_format="pyarrow").materialize()

    def _seed(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy().astype(np.int64)
        d = np.where(seed_pred(ids), 0, BFS_INF).astype(np.int64)
        return pa.table({"_nid": pa.array(ids), "_d": pa.array(d)})

    dist = nodes_ds.map_batches(_seed, batch_format="pyarrow").materialize()
    cap = _iter_cap(dist)

    def _reached(b: pa.Table) -> pa.Table:
        return b.filter(pc.less(b.column("_d"), pa.scalar(BFS_INF)))

    def _relax(b: pa.Table) -> pa.Table:
        return pa.table({
            "_nid": pc.cast(b.column("dst"), pa.int64()),
            "_d": pa.array(b.column("_d").to_numpy()
                           + b.column("_w").to_numpy(), pa.int64())})

    nb = np.uint64(num_buckets or 32)

    def _premin(b: pa.Table) -> pa.Table:
        t = pa.TableGroupBy(b, "_nid").aggregate([("_d", "min")])
        nid = t.column("_nid").to_numpy().astype(np.int64)
        return pa.table({
            "_nid": pa.array(nid),
            "_d": pc.cast(t.column("_d_min"), pa.int64()),
            "_b": pa.array((_mix64(nid) % nb).astype(np.int32))})

    def _minbucket(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, "_nid").aggregate([("_d", "min")])
        return pa.table({"_nid": pc.cast(g.column("_nid"), pa.int64()),
                         "_d": pc.cast(g.column("_d_min"), pa.int64())})

    for _ in range(rounds):
        frontier = dist.map_batches(_reached, batch_format="pyarrow")
        heard = bucketed_hash_join(edges, frontier, "_esrc", "_nid",
                                   num_buckets=num_buckets)
        cand = heard.map_batches(_relax, batch_format="pyarrow")
        dist = _coalesce(dist.union(cand)
                         .map_batches(_premin, batch_format="pyarrow")
                         .groupby("_b").map_groups(_minbucket,
                                                   batch_format="pyarrow"),
                         cap).materialize()

    def _final(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(b.column("_d"), pa.scalar(BFS_INF)))
        return pa.table({id_col: b.column("_nid"), "dist": b.column("_d")})

    return dist.map_batches(_final, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Anchor-text extraction + per-target aggregation
# ---------------------------------------------------------------------------

_ANCHOR_RE = (r'^https://site[0-9]+\.example/page(?P<t>[0-9]+)\.html">'
              r"(?P<txt>[^<]*)</a>")


def extract_anchor_texts(batch: pa.Table, html_col: str = "html",
                         id_col: str = "doc_id") -> pa.Table:
    """(src, dst, anchor) rows from an HTML column, fully Arrow-side —
    the anchor-text-corpus primitive (anchor text pointing AT a page is
    classic relevance/label signal for training data). Same
    split_pattern('href="') + flat anchored extract_regex chain as
    ``extract_link_pairs``, with the regex also capturing the anchor's
    inner text up to ``</a>``. Unlike link pairs, duplicate (src, dst)
    anchors are KEPT (each carries its own text); self-anchors drop."""
    empty = pa.table({"src": pa.array([], pa.int64()),
                      "dst": pa.array([], pa.int64()),
                      "anchor": pa.array([], pa.string())})
    if len(batch) == 0:
        return empty
    ids = batch.column(id_col).to_numpy().astype(np.int64)
    s = pc.cast(batch.column(html_col), pa.large_string())
    parts = pc.split_pattern(s, 'href="')
    flat = pc.list_flatten(parts)
    parents = pc.list_parent_indices(parts).to_numpy().astype(np.int64)
    if len(parents) == 0:
        return empty
    keep = np.ones(len(parents), dtype=bool)
    keep[np.r_[True, parents[1:] != parents[:-1]]] = False
    m = pc.extract_regex(pc.take(flat, pa.array(np.flatnonzero(keep))),
                         _ANCHOR_RE)
    tgt = pc.struct_field(m, "t")
    txt = pc.struct_field(m, "txt")
    par = parents[keep]
    ok = pc.is_valid(tgt).to_numpy(zero_copy_only=False)
    src = ids[par[ok]]
    dst = pc.cast(pc.drop_null(tgt), pa.int64()).to_numpy()
    texts = pc.drop_null(txt)
    sel = src != dst
    return pa.table({
        "src": pa.array(src[sel], pa.int64()),
        "dst": pa.array(dst[sel], pa.int64()),
        "anchor": pc.take(texts, pa.array(np.flatnonzero(sel))),
    })


def anchor_text_stats(anchors_ds, num_buckets: int = 64):
    """Per-target anchor profile: (doc_id, n_anchors, n_texts,
    top_text) where n_texts counts DISTINCT anchor strings and
    top_text is the lexicographic min (a deterministic representative).

    Plan: batch-local collapse to unique (dst, anchor) partial rows
    with counts (bounded by per-batch distinct pairs), ONE bucketed
    shuffle on dst, then one vectorized pandas combine per bucket.
    Distinct-count state never leaves the bucket; nothing corpus-sized
    touches the driver."""
    from ..functions.joins import _mix64

    nb = np.uint64(num_buckets)

    def _partial(b: pa.Table) -> pa.Table:
        t = pa.TableGroupBy(
            b.select(["dst", "anchor"]),
            ["dst", "anchor"]).aggregate([([], "count_all")])
        d = t.column("dst").to_numpy().astype(np.int64)
        return pa.table({
            "dst": pa.array(d),
            "anchor": t.column("anchor"),
            "n": pc.cast(t.column("count_all"), pa.int64()),
            "_b": pa.array((_mix64(d) % nb).astype(np.int32))})

    def _combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("dst").agg(
            n_anchors=("n", "sum"),
            n_texts=("anchor", "nunique"),
            top_text=("anchor", "min")).reset_index()
        return pd.DataFrame({
            "doc_id": agg["dst"].astype(np.int64),
            "n_anchors": agg["n_anchors"].astype(np.int64),
            "n_texts": agg["n_texts"].astype(np.int64),
            "top_text": agg["top_text"]})

    return (anchors_ds.map_batches(_partial, batch_format="pyarrow")
            .groupby("_b").map_groups(_combine, batch_format="pandas"))


# ---------------------------------------------------------------------------
# Two-hop neighborhood reach (distinct nodes within <= 2 hops)
# ---------------------------------------------------------------------------

def two_hop_reach(pairs_ds, num_buckets: int | None = None):
    """Per-node count of DISTINCT nodes reachable in one or two hops
    (self excluded) — the friends-of-friends audience size.

    Plan: ONE bucketed hash join of the edge table with itself on the
    mid node (e1.dst = e2.src) produces the 2-hop pairs; they union
    the 1-hop pairs, then a batch-local (src, w) dedup collapses
    duplicates before ONE bucketed shuffle on src and a per-bucket
    exact distinct count. SCALE: pair volume is sum(out_deg * in_deg)
    over mid nodes — the inherent two-hop cost (same caveat as
    od_two_hop); a power-law hub as mid node dominates it, so at
    web scale cap mid-node degree (drop or sample over-cap mids,
    counting them) or swap the exact distinct for the HLL sketch in
    functions.sketch — both documented growth paths, neither needed at
    fixture degree (~2).
    """
    from ..functions.joins import _mix64, bucketed_hash_join

    edges = pairs_ds.map_batches(
        lambda b: pa.table({"_esrc": pc.cast(b.column("src"), pa.int64()),
                            "dst": pc.cast(b.column("dst"), pa.int64())}),
        batch_format="pyarrow").materialize()
    rev = edges.map_batches(
        lambda b: pa.table({"_mid": b.column("_esrc"),
                            "w": b.column("dst")}),
        batch_format="pyarrow")
    hop2 = bucketed_hash_join(edges, rev, "dst", "_mid",
                              num_buckets=num_buckets)
    # hop2: (_key=mid, _esrc, w) -> (src, w)
    pairs2 = hop2.map_batches(
        lambda b: pa.table({"src": pc.cast(b.column("_esrc"), pa.int64()),
                            "w": pc.cast(b.column("w"), pa.int64())}),
        batch_format="pyarrow")
    pairs1 = edges.map_batches(
        lambda b: pa.table({"src": b.column("_esrc"),
                            "w": b.column("dst")}),
        batch_format="pyarrow")

    nb = np.uint64(64)

    def _local(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy().astype(np.int64)
        w = b.column("w").to_numpy().astype(np.int64)
        keep = s != w
        t = pa.table({"src": pa.array(s[keep]), "w": pa.array(w[keep])})
        t = pa.TableGroupBy(t, ["src", "w"]).aggregate([])
        s2 = t.column("src").to_numpy().astype(np.int64)
        return pa.table({
            "src": pa.array(s2), "w": t.column("w"),
            "_b": pa.array((_mix64(s2) % nb).astype(np.int32))})

    def _count(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.drop_duplicates(["src", "w"]).groupby("src").size()
        return pd.DataFrame({"doc_id": agg.index.to_numpy(np.int64),
                             "n_reach2": agg.to_numpy(np.int64)})

    return (pairs1.union(pairs2)
            .map_batches(_local, batch_format="pyarrow")
            .groupby("_b").map_groups(_count, batch_format="pandas"))


def mutual_edges(pairs_ds, num_buckets: int | None = None):
    """Reciprocated (mutual) link pairs as undirected (id_a < id_b)
    rows — the mutual-link subgraph is the standard spam-resistant
    community substrate (a link farm rarely gets links BACK from its
    targets). ONE bucketed self-join on the packed directed-edge key:
    edge (s, d) matches the reversed key (d, s); each mutual pair
    surfaces twice (once per direction), which downstream min-label
    components absorb idempotently. Node ids < 2^31 (packed key)."""
    from ..functions.joins import bucketed_hash_join

    def _fwd(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy().astype(np.int64)
        d = b.column("dst").to_numpy().astype(np.int64)
        return pa.table({
            "_k": pa.array(_pack(s, d)),
            "id_a": pa.array(np.minimum(s, d)),
            "id_b": pa.array(np.maximum(s, d))})

    def _rev(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy().astype(np.int64)
        d = b.column("dst").to_numpy().astype(np.int64)
        return pa.table({"_rk": pa.array(_pack(d, s))})

    fwd = pairs_ds.map_batches(_fwd, batch_format="pyarrow")
    rev = pairs_ds.map_batches(_rev, batch_format="pyarrow")
    matched = bucketed_hash_join(fwd, rev, "_k", "_rk",
                                 num_buckets=num_buckets)
    return matched.map_batches(
        lambda b: pa.table({"id_a": pc.cast(b.column("id_a"), pa.int64()),
                            "id_b": pc.cast(b.column("id_b"), pa.int64())}),
        batch_format="pyarrow")
