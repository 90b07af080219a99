"""Training-data curation operators: TF-IDF term scoring, benchmark
decontamination, PII scrubbing, mixture rebalancing.

These extend the LLM-pipeline family (dedup / quality / langid /
fingerprints in geoflow.stages.dedup and .textstats) with the other
three curation passes a web-scale corpus build runs before training:

- ``tfidf_top_terms``: per-document top-k salient terms. Distributed
  shape: one pass builds exact (doc, term, tf) rows (Arrow hash
  aggregate per batch), DF comes from a combiner-style grouped count
  (shuffle moves one row per distinct (batch, term)), and the doc-level
  top-k runs inside bucket groups. Scores are EXACT integers
  (tf * 10^12 // df — reciprocal-df idf; monotone in tf and 1/df) so
  the DuckDB oracle replays them bit-for-bit with no float-tie risk.
- ``benchmark_shingle_set`` / ``decontaminate``: flag corpus documents
  sharing any word-k-shingle with a benchmark/eval set — the standard
  contamination filter before training. The benchmark side is small BY
  NATURE (eval sets), so its distinct shingles broadcast via
  ``ray.put`` and the corpus streams once; no shuffle at all.
- ``pii_scrub_batch``: count + redact email/phone spans with pinned
  regexes chosen to behave identically in Python ``re`` and DuckDB's
  RE2 (character-class bodies only, no backtracking constructs), so
  the scrub is SQL-replayable.
- ``mixture_rebalance``: deterministic per-group downsampling to an
  integer target mixture (the data-mixing step before training): one
  combiner-pattern counting pass derives per-group acceptance
  thresholds on the driver (group-cardinality-sized, never row-sized),
  then the corpus streams once through a hash-acceptance filter. The
  acceptance rule is a pure integer function of (key, group, global
  counts) — any partitioning, any cluster size, any re-run keeps the
  same documents, and DuckDB replays the whole chain exactly.

No reference counterpart (the reference is a raster-correction plugin);
these follow the task brief's training-data operator list.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _mix_cols

# score scale: tf * SCORE_NUM // df stays far inside int64 for any real
# document (tf <= doc tokens ~ 10^6) and any corpus (df >= 1)
_SCORE_NUM = 10 ** 12

# Terms-dictionary broadcast guard: DF tables are vocab-sized (compact
# even for web corpora), but above this row count the join falls back to
# the bucketed hash join on a 64-bit term hash.
DF_BROADCAST_LIMIT = 5_000_000


def tf_rows(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """(doc, term, tf) rows for one batch — exact term frequencies via
    token explode + Arrow hash aggregate (no per-doc Python counting)."""
    ids = batch.column(id_col).to_numpy().astype(np.int64)
    texts = batch.column(text_col).to_pylist()
    toks_per_doc = [(t or "").split() for t in texts]
    lens = np.fromiter((len(t) for t in toks_per_doc), dtype=np.int64,
                       count=len(toks_per_doc))
    if lens.sum() == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "term": pa.array([], pa.string()),
                         "tf": pa.array([], pa.int64())})
    flat_terms = [w for toks in toks_per_doc for w in toks]
    doc = np.repeat(ids, lens)
    t = pa.table({id_col: pa.array(doc, pa.int64()),
                  "term": pa.array(flat_terms, pa.string())})
    out = pa.TableGroupBy(t, [id_col, "term"]).aggregate([([], "count_all")])
    return pa.table({id_col: out.column(id_col),
                     "term": out.column("term"),
                     "tf": out.column("count_all")})


def tfidf_top_terms(ds, id_col: str = "doc_id", text_col: str = "text",
                    k: int = 3, num_buckets: int = 64):
    """Top-k terms per document by exact integer tf-idf score.

    score_e12 = tf * 10^12 // df (reciprocal-df idf: equivalent ranking
    to tf/df; integer-exact on both engine and oracle sides). Ties
    break on term ascending; output (id, term, score_e12, rk 1..k).

    Plan: tf rows from one streaming pass; DF = grouped count over the
    distinct (batch, term) partials (combiner pattern — the shuffle is
    vocab x batches rows, never corpus-sized); the DF dictionary
    broadcasts under ``DF_BROADCAST_LIMIT`` (vocabularies are compact)
    or joins by 64-bit term hash above it; per-doc top-k runs inside
    hash(doc) bucket groups, vectorized.
    """
    import ray

    from ..functions.agg import grouped_count_sum
    from ..functions.joins import bucketed_hash_join

    tf = ds.map_batches(lambda b: tf_rows(b, id_col, text_col),
                        batch_format="pyarrow")
    df_ds = grouped_count_sum(tf, ["term"], [], count_alias="df") \
        .materialize()

    if df_ds.count() <= DF_BROADCAST_LIMIT:
        df_tbl = df_ds.to_pandas()
        lookup = ray.put(dict(zip(df_tbl["term"], df_tbl["df"])))

        def _score(b: pa.Table) -> pa.Table:
            d = ray.get(lookup)
            terms = b.column("term").to_pylist()
            dfv = np.fromiter((d[t] for t in terms), dtype=np.int64,
                              count=len(terms))
            tfv = b.column("tf").to_numpy().astype(np.int64)
            sc = tfv * _SCORE_NUM // dfv
            return pa.table({
                id_col: b.column(id_col), "term": b.column("term"),
                "score_e12": pa.array(sc, pa.int64())})

        scored = tf.map_batches(_score, batch_format="pyarrow")
    else:
        # both sides large: join on a 64-bit term hash (collision odds
        # are ~n^2/2^64 — negligible and deterministic; the broadcast
        # path above is exact and is the one the oracle verifies)
        from .dedup import dual_poly_token_hashes

        def _h(col_name):
            def _f(b: pa.Table) -> pa.Table:
                h = dual_poly_token_hashes(b.column("term").to_pylist())
                return b.append_column(col_name,
                                       pa.array(h.view(np.int64)))
            return _f

        j = bucketed_hash_join(
            tf.map_batches(_h("_th"), batch_format="pyarrow"),
            df_ds.map_batches(_h("_dh"), batch_format="pyarrow")
                 .map_batches(lambda b: b.select(["_dh", "df"]),
                              batch_format="pyarrow"),
            "_th", "_dh", num_buckets=num_buckets)

        def _score_j(b: pa.Table) -> pa.Table:
            tfv = b.column("tf").to_numpy().astype(np.int64)
            dfv = b.column("df").to_numpy().astype(np.int64)
            sc = tfv * _SCORE_NUM // dfv
            return pa.table({
                id_col: b.column(id_col), "term": b.column("term"),
                "score_e12": pa.array(sc, pa.int64())})

        scored = j.map_batches(_score_j, batch_format="pyarrow")

    def _tag(b: pa.Table) -> pa.Table:
        gb = (_mix_cols(b.column(id_col).to_numpy())
              % np.uint64(num_buckets)).astype(np.int32)
        return b.append_column("_gb", pa.array(gb))

    def _topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "score_e12", "term"],
                          ascending=[True, False, True],
                          kind="mergesort")
        g["rk"] = g.groupby(id_col, sort=False).cumcount() + 1
        out = g[g["rk"] <= k]
        return out[[id_col, "term", "score_e12", "rk"]]

    return scored.map_batches(_tag, batch_format="pyarrow") \
        .groupby("_gb").map_groups(_topk, batch_format="pandas")


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

def word_shingles(text: str, k: int = 5) -> list[str]:
    """Distinct word-k-shingles (space-joined); docs shorter than k
    tokens form one whole-text shingle; empty docs none — the same
    convention as the MinHash family (geoflow.stages.dedup)."""
    toks = (text or "").split()
    if not toks:
        return []
    if len(toks) < k:
        return [" ".join(toks)]
    return list({" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)})


def benchmark_shingle_set(bench_ds, text_col: str = "text",
                          k: int = 5) -> set[str]:
    """Distinct shingles of the benchmark side, collected to the driver.
    Benchmarks/eval sets are small by nature — this is the documented
    broadcast-side bound (the corpus side never materializes)."""
    def _sh(b: pa.Table) -> pa.Table:
        out = []
        for t in b.column(text_col).to_pylist():
            out.extend(word_shingles(t, k))
        return pa.table({"s": pa.array(sorted(set(out)), pa.string())})

    rows = bench_ds.map_batches(_sh, batch_format="pyarrow").unique("s")
    return set(rows or [])


def decontaminate(corpus_ds, bench_shingles: set[str],
                  id_col: str = "doc_id", text_col: str = "text",
                  k: int = 5):
    """(id, n_contaminated) for every corpus doc sharing >= 1 distinct
    word-k-shingle with the benchmark set. The set rides the object
    store (``ray.put``); the corpus streams through one map pass."""
    import ray

    ref = ray.put(frozenset(bench_shingles))

    def _flag(b: pa.Table) -> pa.Table:
        bs = ray.get(ref)
        ids = b.column(id_col).to_numpy().astype(np.int64)
        out_id, out_n = [], []
        for i, t in zip(ids.tolist(), b.column(text_col).to_pylist()):
            n = sum(1 for s in word_shingles(t, k) if s in bs)
            if n:
                out_id.append(i)
                out_n.append(n)
        return pa.table({id_col: pa.array(out_id, pa.int64()),
                         "n_contaminated": pa.array(out_n, pa.int64())})

    return corpus_ds.map_batches(_flag, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# Patterns restricted to character-class bodies + bounded repeats: the
# constructs where Python re (backtracking) and DuckDB RE2 (automaton)
# produce identical matches, making the scrub SQL-replayable.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PII_PHONE = r"\+[0-9][0-9()\- ]{6,}[0-9]"
_RE_EMAIL = re.compile(PII_EMAIL)
_RE_PHONE = re.compile(PII_PHONE)


def pii_scrub_batch(batch: pa.Table, id_col: str = "doc_id",
                    text_col: str = "text") -> pa.Table:
    """Redact emails then phones ([EMAIL]/[PHONE]), counting each.
    Output: (id, n_emails, n_phones, scrubbed_len, scrubbed_text)."""
    ids = batch.column(id_col)
    n_e = np.empty(len(ids), dtype=np.int64)
    n_p = np.empty(len(ids), dtype=np.int64)
    out_t = []
    for i, t in enumerate(batch.column(text_col).to_pylist()):
        t = t or ""
        t1, ne = _RE_EMAIL.subn("[EMAIL]", t)
        t2, np_ = _RE_PHONE.subn("[PHONE]", t1)
        n_e[i], n_p[i] = ne, np_
        out_t.append(t2)
    return pa.table({
        id_col: ids,
        "n_emails": pa.array(n_e, pa.int64()),
        "n_phones": pa.array(n_p, pa.int64()),
        "scrubbed_len": pa.array(
            np.fromiter((len(t) for t in out_t), dtype=np.int64,
                        count=len(out_t)), pa.int64()),
        "scrubbed_text": pa.array(out_t, pa.string()),
    })


# ---------------------------------------------------------------------------
# Mixture rebalancing (deterministic downsampling to a target mixture)
# ---------------------------------------------------------------------------

# Acceptance-hash resolution: thresholds are permillion of the key-hash
# space, matching the permille convention of webquality.split_assign_batch
# at 1000x finer grain so small rates stay representable.
MIX_DENOM = 1_000_000


def mixture_thresholds(counts: dict[str, int], target: dict[str, int],
                       denom: int = MIX_DENOM) -> dict[str, int]:
    """Integer-exact per-group acceptance thresholds that downsample a
    corpus with group counts ``counts`` to the largest total size whose
    expected mixture matches integer ``target`` weights.

    With W = sum of target weights, the largest total T satisfying
    (w_g / W) * T <= n_g for every targeted present group is
    T = min_g (n_g * W) // w_g; the group's acceptance threshold is
    thresh_g = (w_g * T * denom) // (W * n_g), i.e. accept a row iff
    hash(key) % denom < thresh_g. All arithmetic is Python bigint
    (no overflow at any corpus size); the DuckDB oracle replays it in
    HUGEINT. Groups absent from ``target`` (or with zero weight or zero
    count) get no threshold and drop entirely.
    """
    W = sum(target.values())
    present = {g: n for g, n in counts.items()
               if target.get(g, 0) > 0 and n > 0}
    if not present or W <= 0:
        return {}
    T = min((n * W) // target[g] for g, n in present.items())
    return {g: (target[g] * T * denom) // (W * n)
            for g, n in present.items()}


def group_counts(ds, group_col: str):
    """Per-group row counts: per-batch Arrow hash-aggregate partials ->
    ONE group-cardinality-sized groupby (combiner pattern — the shuffle
    moves one row per distinct (batch, group), never corpus-sized)."""
    from ray.data.aggregate import Sum

    def _partial(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b.select([group_col]), [group_col]) \
            .aggregate([([], "count_all")])
        return pa.table({group_col: g.column(group_col),
                         "n": pc.cast(g.column("count_all"), pa.int64())})

    return (ds.map_batches(_partial, batch_format="pyarrow")
            .groupby(group_col).aggregate(Sum("n", alias_name="n")))


def mixture_rebalance(ds, target: dict[str, int], key_col: str,
                      group_col: str = "lang", denom: int = MIX_DENOM):
    """Deterministically downsample ``ds`` so surviving rows match the
    integer ``target`` mixture over ``group_col`` as closely as the
    observed counts allow, without dropping more than necessary.

    Two streaming passes: (1) group counts via the combiner pattern —
    the driver holds only the group-cardinality-sized count table and
    the derived thresholds (broadcast once via ``ray.put``); (2) a
    stateless filter accepting a row iff
    ``poly_string_hash(key) % denom < thresh[group]``. Deterministic in
    (key, group, global counts) alone — identical output on any
    cluster size, partitioning, or re-run — and exactly replayable in
    SQL (the char-fold hash via list_reduce, the thresholds in HUGEINT).

    ``key_col`` should be a url-length key: the char-fold hash needs a
    handful of folds to mix, so 1-3 char keys cluster in the low hash
    range (same convention as ``webquality.split_assign_batch``).

    Returns ``(filtered_ds, counts, thresholds)``.
    """
    import ray

    from .webquality import poly_string_hash_vec

    cnt = group_counts(ds, group_col).to_pandas()  # group-cardinality-sized
    counts = dict(zip(cnt[group_col], cnt["n"].astype(int)))
    th = mixture_thresholds(counts, target, denom)
    ref = ray.put(th)

    def _accept(b: pa.Table) -> pa.Table:
        t = ray.get(ref)
        keys = pc.cast(b.column(key_col), pa.string()).to_pylist()
        pm = poly_string_hash_vec([k or "" for k in keys]) % denom
        thr = np.fromiter((t.get(g, -1) for g in
                           b.column(group_col).to_pylist()),
                          dtype=np.int64, count=len(keys))
        return b.filter(pa.array(pm < thr))

    return ds.map_batches(_accept, batch_format="pyarrow"), counts, th


# ---------------------------------------------------------------------------
# Epoch shuffle: deterministic per-epoch global permutation
# ---------------------------------------------------------------------------

_SHUF_P = 2147483647          # 2^31 - 1 (Lehmer modulus)


def epoch_shuffle_key(ids: np.ndarray, epoch: int) -> np.ndarray:
    """Deterministic pseudo-random rank for (doc, epoch): an LCG fold
    followed by a Lehmer step, all inside int64 (max intermediate
    ~1e14), so DuckDB replays it verbatim in BIGINT arithmetic."""
    h = (ids.astype(np.int64) * 1103515245 + 12345
         + np.int64(epoch) * 40503) % _SHUF_P
    return (h * 48271) % _SHUF_P


def epoch_shuffle(ds, epoch: int, id_col: str = "doc_id"):
    """Global deterministic shuffle for one training epoch: attach the
    epoch-seeded rank and range-sort by (rank, id). The permutation is
    a pure function of (id, epoch) — any cluster size, any partition
    layout, any re-run streams batches in the same order, which makes
    epoch data order reproducible AND resumable (a reader that died at
    rank r restarts from rank > r). The sort is Ray's range-partition
    shuffle; nothing lands on the driver."""
    def _key(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy().astype(np.int64)
        return b.append_column(
            "shuffle_rank", pa.array(epoch_shuffle_key(ids, epoch)))

    return ds.map_batches(_key, batch_format="pyarrow").sort(
        ["shuffle_rank", id_col])


# ---------------------------------------------------------------------------
# Token-budget corpus selection: distributed ordered prefix under budget
# ---------------------------------------------------------------------------

def token_budget_select(ds, budgets: dict, group_col: str = "lang",
                        weight_col: str = "n_chars",
                        id_col: str = "doc_id", seed: int = 1,
                        num_rank_buckets: int = 512):
    """Select, per group, the prefix of documents in deterministic
    shuffled order whose cumulative weight stays within the group's
    budget — the "first N tokens per language" step of a data-budgeted
    training mix.

    The order is (epoch_shuffle_key(id, seed), id): a pure integer
    function, so the SQL twin is a plain window cumsum. The
    distributed shape is a two-pass prefix sum: rank space splits into
    ``num_rank_buckets`` ranges; pass 1 is one tiny (group, bucket)
    weight rollup from which the driver finds each group's boundary
    bucket and remaining budget (group x bucket rows, never docs);
    pass 2 keeps pre-boundary buckets with a stateless filter and
    resolves ONLY the boundary bucket rows with an exact per-group
    scan (bucket-sized groups — scale num_rank_buckets with the
    corpus). Nothing doc-sized touches the driver.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    width = (_SHUF_P + num_rank_buckets - 1) // num_rank_buckets

    def _rank(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy().astype(np.int64)
        rk = epoch_shuffle_key(ids, seed)
        b = b.append_column("_rk", pa.array(rk))
        return b.append_column("_rb", pa.array(rk // width))

    ranked = ds.map_batches(_rank, batch_format="pyarrow").materialize()

    def _roll(b: pa.Table) -> pa.Table:
        t = pa.table({group_col: b.column(group_col),
                      "_rb": b.column("_rb"),
                      "_w": pc.cast(b.column(weight_col), pa.int64())})
        g = pa.TableGroupBy(t, [group_col, "_rb"]).aggregate(
            [("_w", "sum")])
        return pa.table({group_col: g.column(group_col),
                         "_rb": g.column("_rb"),
                         "_w": g.column("_w_sum")})

    rolls = (ranked.map_batches(_roll, batch_format="pyarrow")
             .groupby([group_col, "_rb"])
             .aggregate(Sum("_w", alias_name="w")).to_pandas())

    # driver state: one (boundary bucket, remaining budget) per group
    bounds: dict = {}
    for grp, sub in rolls.groupby(group_col):
        sub = sub.sort_values("_rb")
        cum = sub["w"].cumsum()
        budget = int(budgets.get(grp, 0))
        full = cum <= budget
        if full.all():
            bounds[grp] = (np.iinfo(np.int64).max, 0)
            continue
        first_over = int(np.argmin(full.to_numpy()))
        b_star = int(sub["_rb"].iloc[first_over])
        prior = int(cum.iloc[first_over - 1]) if first_over else 0
        bounds[grp] = (b_star, budget - prior)
    bounds_ref = ray.put(bounds)

    def _pre(b: pa.Table) -> pa.Table:
        bd = ray.get(bounds_ref)
        grp = b.column(group_col).to_pylist()
        rb = b.column("_rb").to_numpy()
        lim = np.array([bd.get(g, (-1, 0))[0] for g in grp], np.int64)
        return b.filter(pa.array(rb < lim))

    def _at_boundary(b: pa.Table) -> pa.Table:
        bd = ray.get(bounds_ref)
        grp = b.column(group_col).to_pylist()
        rb = b.column("_rb").to_numpy()
        lim = np.array([bd.get(g, (-1, 0))[0] for g in grp], np.int64)
        return b.filter(pa.array(rb == lim))

    def _exact_prefix(g: pd.DataFrame) -> pd.DataFrame:
        bd = ray.get(bounds_ref)
        rem = bd.get(g[group_col].iloc[0], (-1, 0))[1]
        g = g.sort_values(["_rk", id_col])
        keep = g[weight_col].cumsum() <= rem
        return g[keep.to_numpy()]

    kept_pre = ranked.map_batches(_pre, batch_format="pyarrow")
    kept_boundary = (ranked.map_batches(_at_boundary,
                                        batch_format="pyarrow")
                     .groupby(group_col)
                     .map_groups(_exact_prefix, batch_format="pandas"))
    out = kept_pre.union(kept_boundary)
    return out.map_batches(
        lambda b: b.drop_columns(["_rk", "_rb"]), batch_format="pyarrow")


# Partial blocks fed to one A-ES merge task; above this (estimated)
# block count an intermediate local-top-k level runs before the final
# reduce so the terminal task never sees more than ~fanin * k rows.
AES_TREE_FANIN = 256


def weighted_sample_aes(ds, k: int, id_col: str = "doc_id",
                        weight_col: str = "n_chars",
                        keep_cols: tuple = ("doc_id", "lang", "n_chars"),
                        tree_fanin: int = AES_TREE_FANIN,
                        num_blocks_hint: int | None = None):
    """Efraimidis-Spirakis A-ES weighted sampling WITHOUT replacement:
    item i gets key u_i^(1/w_i) with u_i uniform in (0,1); the global
    top-k keys are a weighted sample without replacement (probability
    of inclusion proportional to weight, exactly).

    Determinism + replay: u_i derives from a Knuth multiplicative hash
    of the id ((id * 2654435761 + 987654321) mod 2^32, then
    (h + 0.5) / 2^32 so u is never 0), and the ordering uses the
    monotone transform ln(u)/w — identical rows on every run, every
    cluster size and every block layout, and replayable in SQL as
    ``ORDER BY ln(...) / w DESC LIMIT k``.

    Distributed plan: each block emits only its LOCAL top-k (k slim
    rows per block — the global winner set is a subset of the union of
    local winners); above ``tree_fanin`` (estimated) partial blocks,
    intermediate local-top-k merge levels run (``tree_merge``) so the
    terminal reduce's fan-in stays bounded — nothing corpus-sized ever
    leaves the blocks, and no task ever sees more than ~fanin*k rows.
    Every level applies the same deterministic (key DESC, id ASC)
    top-k, so the multi-level result is IDENTICAL to the single-level
    one (pinned by test_curation's forced-tree equality test).

    Zero/negative weights are excluded (their A-ES key is degenerate),
    matching the SQL replay's ``WHERE w > 0``.
    """
    from ..functions.agg import (coalesce_blocks, estimate_num_blocks,
                                 tree_merge)

    def _key(b: pa.Table):
        ids = b.column(id_col).to_numpy().astype(np.uint64)
        w = b.column(weight_col).to_numpy().astype(np.float64)
        h = (ids * np.uint64(2654435761) + np.uint64(987654321)) \
            % np.uint64(4294967296)
        u = (h.astype(np.float64) + 0.5) / 4294967296.0
        # zero-weight rows are filtered AFTER the divide; silence the
        # inf/nan the discarded lanes would otherwise warn about
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.log(u) / w, w

    def _local_topk(b: pa.Table) -> pa.Table:
        key, w = _key(b)
        ok = w > 0
        idx = np.nonzero(ok)[0]
        if idx.size == 0:
            return pa.table(
                {c: b.column(c).take(pa.array([], pa.int64()))
                 for c in keep_cols} | {"_key": pa.array([], pa.float64())})
        kk, ids = key[idx], b.column(id_col).to_numpy()[idx]
        order = np.lexsort((ids, -kk))[:k]   # key DESC, id ASC
        sel = pa.array(idx[order])
        out = {c: b.column(c).take(sel) for c in keep_cols}
        out["_key"] = pa.array(kk[order], pa.float64())
        return pa.table(out)

    def _merge_topk(b: pa.Table) -> pa.Table:
        # intermediate tree level: same deterministic top-k over rows
        # that already carry their A-ES key
        kk = b.column("_key").to_numpy()
        ids = b.column(id_col).to_numpy()
        order = np.lexsort((ids, -kk))[:k]
        sel = pa.array(order)
        out = {c: b.column(c).take(sel) for c in keep_cols}
        out["_key"] = b.column("_key").take(sel)
        return pa.table(out)

    partials = ds.map_batches(_local_topk, batch_format="pyarrow",
                              batch_size=None)
    if num_blocks_hint is None:
        num_blocks_hint = estimate_num_blocks(ds)
    partials = tree_merge(partials, _merge_topk, tree_fanin,
                          num_blocks_hint)
    merged = coalesce_blocks(partials, 1)

    def _final(b: pa.Table) -> pa.Table:
        kk = b.column("_key").to_numpy()
        ids = b.column(id_col).to_numpy()
        order = np.lexsort((ids, -kk))[:k]
        sel = pa.array(order)
        return pa.table({c: b.column(c).take(sel) for c in keep_cols})

    return merged.map_batches(_final, batch_format="pyarrow",
                              batch_size=None)
