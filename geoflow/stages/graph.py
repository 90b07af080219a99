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
            f"go {t}</a><p>filler {i}</p>"
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
                 num_buckets: int | None = None):
    """Damped PageRank over ``iters`` fixed iterations in exact int64.

    r_0[v] = scale;  r_{k+1}[v] = (15*scale)//100
                     + sum_{u->v} (85 * r_k[u]) // (100 * outdeg[u])

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

    ranks = nodes_ds.map_batches(
        lambda b: pa.table({
            "_rid": pc.cast(b.column(id_col), pa.int64()),
            "_r": pa.array(np.full(len(b), scale, dtype=np.int64))}),
        batch_format="pyarrow").materialize()

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
        ranks = summed.map_batches(
            lambda b: pa.table({
                "_rid": pc.cast(b.column("dst"), pa.int64()),
                "_r": pa.array(base + b.column("_s").to_numpy()
                               .astype(np.int64), pa.int64())}),
            batch_format="pyarrow").materialize()

    return ranks.map_batches(
        lambda b: pa.table({id_col: b.column("_rid"),
                            "pr": b.column("_r")}),
        batch_format="pyarrow")
