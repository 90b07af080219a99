"""Pre-aggregation (combiner) helpers for shuffle-light grouped reductions.

Pattern (SURVEY.md section 7.3, ray_guide "Aggregation at scale"): a bare
``groupby(key).aggregate(...)`` shuffles every row. For algebraic
aggregates (count/sum/min/max/mean) we first collapse each *batch* to one
row per key inside ``map_batches`` (a local combine, no shuffle), then run
the small ``groupby`` over the partials. With B batches and K distinct
keys per batch the shuffle moves O(B*K) rows instead of O(N) — at web
scale with Zipf-hot cells this is the difference between a working zonal
aggregate and an all-to-all bottleneck; hot keys are additionally safe
because partials for the same key combine associatively.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Count, Max, Min, Sum


def partial_group_sums(key_cols: list[str], sum_cols: list[str],
                       count_col: str = "_n",
                       min_cols: list[str] | None = None,
                       max_cols: list[str] | None = None):
    """Return a map_batches fn collapsing a batch to per-key partial rows.

    Output columns: key_cols + [f"{c}_sum"] + [count_col] (+ min/max).
    """
    min_cols = min_cols or []
    max_cols = max_cols or []

    def _combine(batch: pa.Table):
        if batch.num_rows == 0:      # post-shuffle zero-row blocks can
            return                   # carry an EMPTY schema — emit nothing
        t = batch.select(key_cols + sorted(set(sum_cols + min_cols
                                               + max_cols)))
        # Arrow C++ hash aggregate (same swap as flagship dedup's local
        # combine: order-of-magnitude faster than pandas groupby-agg at
        # typical block sizes, no pandas round-trip)
        specs = ([(c, "sum") for c in sum_cols]
                 + [(c, "min") for c in min_cols]
                 + [(c, "max") for c in max_cols]
                 + [([], "count_all")])
        out = pa.TableGroupBy(t, key_cols).aggregate(specs)
        cols = {k: out.column(k) for k in key_cols}
        for c in sum_cols:
            cols[f"{c}_sum"] = out.column(f"{c}_sum")
        for c in min_cols:
            cols[f"{c}_min"] = out.column(f"{c}_min")
        for c in max_cols:
            cols[f"{c}_max"] = out.column(f"{c}_max")
        cols[count_col] = out.column("count_all")
        yield pa.table(cols)

    return _combine


def grouped_count_sum(ds, key_cols: list[str], sum_cols: list[str],
                      count_alias: str = "n",
                      min_cols: list[str] | None = None,
                      max_cols: list[str] | None = None,
                      coalesce: int | None = None):
    """count + sums per key with batch-level pre-aggregation.

    Result columns: key_cols, ``count_alias``, and ``{c}_sum`` per sum col
    (plus ``{c}_min``/``{c}_max`` when requested).

    ``coalesce``: when the key cardinality K is known-small (zones,
    nations, sites — tens to thousands), pass a small block count to
    collapse the slim partials (O(B*K) rows for B input blocks) before
    the groupby. Ray's sort shuffle makes one reduce partition per
    input block, so K keys spread over B>>K partials blocks leaves most
    reduce partitions EMPTY — each emits a zero-row empty-schema block
    ("RefBundle with a different schema" warnings) and pays a task
    launch. Coalescing to ~1 block makes the final combine one small
    task. Leave None for high-cardinality keys (the partials are no
    longer slim; use grouped_count_sum_bucketed there instead).
    """
    partial = partial_group_sums(key_cols, sum_cols, min_cols=min_cols,
                                 max_cols=max_cols)
    partials = ds.map_batches(partial, batch_format="pyarrow")
    if coalesce is not None:
        partials = coalesce_blocks(partials, coalesce)
    aggs = [Sum("_n", alias_name=count_alias)]
    for c in sum_cols:
        aggs.append(Sum(f"{c}_sum", alias_name=f"{c}_sum"))
    for c in (min_cols or []):
        aggs.append(Min(f"{c}_min", alias_name=f"{c}_min"))
    for c in (max_cols or []):
        aggs.append(Max(f"{c}_max", alias_name=f"{c}_max"))
    key = key_cols[0] if len(key_cols) == 1 else key_cols
    return partials.groupby(key).aggregate(*aggs)


def grouped_count_sum_bucketed(ds, key_cols: list[str],
                               sum_cols: list[str],
                               count_alias: str = "n",
                               num_buckets: int = 64):
    """Same result as ``grouped_count_sum`` but the final combine is a
    hash-bucket shuffle + ONE vectorized Arrow hash-aggregate per
    bucket, instead of Ray's per-key sort-based ``groupby.aggregate``.

    Right when the post-combine key cardinality is still large (most
    keys appear in few batches, so batch-level pre-aggregation barely
    shrinks the data): Ray's sort-aggregate over ~10^6 mostly-unique
    composite keys measured ~25x slower than this plan on the two-hop
    OD query; the bucketed form moves identical bytes but replaces the
    global key sort + per-key reduce with nbuckets independent Arrow
    group-bys. Same trick the flagship dedup shuffle uses. Key columns
    must be integers (bucket = splitmix64 fold over the key columns).
    """
    import numpy as np

    from .joins import _mix64

    partial = partial_group_sums(key_cols, sum_cols)
    partials = ds.map_batches(partial, batch_format="pyarrow")

    def _bucket(b: pa.Table) -> pa.Table:
        h = _mix64(b.column(key_cols[0]).to_numpy().astype(np.int64))
        for c in key_cols[1:]:
            h = _mix64(h ^ b.column(c).to_numpy().astype(np.uint64))
        return b.append_column(
            "_b", pa.array((h % np.uint64(num_buckets)).astype(np.int32)))

    sum_names = [f"{c}_sum" for c in sum_cols]

    def _combine_bucket(t: pa.Table) -> pa.Table:
        specs = [(n, "sum") for n in sum_names] + [("_n", "sum")]
        out = pa.TableGroupBy(t, key_cols).aggregate(specs)
        cols = {k: out.column(k) for k in key_cols}
        for n in sum_names:
            cols[n] = out.column(f"{n}_sum")
        cols[count_alias] = out.column("_n_sum")
        return pa.table(cols)

    return (partials.map_batches(_bucket, batch_format="pyarrow")
            .groupby("_b")
            .map_groups(_combine_bucket, batch_format="pyarrow"))


def grouped_count_sum_driver(ds, key_cols: list[str], sum_cols: list[str],
                             count_alias: str = "n",
                             min_cols: list[str] | None = None,
                             max_cols: list[str] | None = None) -> pd.DataFrame:
    """Same result as grouped_count_sum, but the FINAL combine runs on
    the driver over the per-batch partial rows (streamed, pandas).

    Right when the distinct-key count is small (<= ~10^6): the per-batch
    partials are already tiny, so a full distributed shuffle would spend
    seconds of fixed sort-shuffle setup to merge kilobytes. The
    distributed variant remains the path for web-scale cardinality.
    """
    partial = partial_group_sums(key_cols, sum_cols, min_cols=min_cols,
                                 max_cols=max_cols)
    partials = ds.map_batches(partial, batch_format="pyarrow")
    pieces = [b for b in partials.iter_batches(batch_size=None,
                                               batch_format="pandas")
              if len(b) > 0]                  # post-shuffle zero-row
    if not pieces:
        cols = (key_cols + [count_alias] + [f"{c}_sum" for c in sum_cols]
                + [f"{c}_min" for c in (min_cols or [])]
                + [f"{c}_max" for c in (max_cols or [])])
        return pd.DataFrame({c: [] for c in cols})
    allp = pd.concat(pieces, ignore_index=True)
    g = allp.groupby(key_cols, sort=False, observed=True)
    spec = {count_alias: (f"_n", "sum")}
    for c in sum_cols:
        spec[f"{c}_sum"] = (f"{c}_sum", "sum")
    for c in (min_cols or []):
        spec[f"{c}_min"] = (f"{c}_min", "min")
    for c in (max_cols or []):
        spec[f"{c}_max"] = (f"{c}_max", "max")
    return g.agg(**spec).reset_index()


def quantile_from_counts(values, counts, q: float) -> float:
    """Linear-interpolated quantile (numpy/DuckDB ``quantile_cont``
    semantics) from a (value -> count) histogram, without expanding it."""
    import numpy as np

    order = np.argsort(values)
    v = np.asarray(values, dtype=np.float64)[order]
    cum = np.cumsum(np.asarray(counts, dtype=np.int64)[order])
    n = int(cum[-1])
    h = (n - 1) * q
    lo = int(np.floor(h))
    hi = min(lo + 1, n - 1)
    x_lo = v[np.searchsorted(cum, lo, side="right")]
    x_hi = v[np.searchsorted(cum, hi, side="right")]
    return float(x_lo + (h - lo) * (x_hi - x_lo))


def grouped_exact_quantiles(ds, key_cols: list[str], value_col: str,
                            qs: dict[str, float],
                            count_alias: str = "n") -> pd.DataFrame:
    """EXACT grouped quantiles for a bounded-cardinality value column.

    Quantiles are holistic (a naive plan ships every row through the
    shuffle), but when the value domain is bounded (quantities, sizes,
    scores, binned floats) the distributed part reduces to an algebraic
    value-count histogram: per-batch combine on (key, value), a groupby
    over O(keys x distinct-values) partial rows, then an O(1) driver
    interpolation per group. Shuffle volume is independent of row count
    — the same plan holds at 10^12 rows.

    ``qs`` maps output column name -> quantile in [0, 1].
    """
    hist = grouped_count_sum(ds, key_cols + [value_col], [],
                             count_alias="_vc").to_pandas()
    rows = []
    for key, g in hist.groupby(key_cols, sort=True, observed=True):
        key = key if isinstance(key, tuple) else (key,)
        row = dict(zip(key_cols, key))
        row[count_alias] = int(g["_vc"].sum())
        for name, q in qs.items():
            row[name] = quantile_from_counts(
                g[value_col].to_numpy(), g["_vc"].to_numpy(), q)
        rows.append(row)
    return pd.DataFrame(rows)


def profile_columns(ds, cols: list[str]):
    """ANALYZE-style column statistics in ONE streaming pass: per
    column (row count, null count, min, max) via batch-level Arrow
    kernels reduced by a constant-key groupby — the stats catalog a
    planner prunes and sizes with (zone maps, join-side choice,
    bucket counts). Min/max are emitted as strings so one schema
    covers every column type; numeric columns stringify via repr of
    the Arrow scalar (deterministic).
    """
    import numpy as np
    import pyarrow.compute as pc

    def _partial(b: pa.Table) -> pa.Table:
        names, n, nn, mn, mx = [], [], [], [], []
        for c in cols:
            col = b.column(c)
            names.append(c)
            n.append(len(col))
            nn.append(col.null_count)
            valid = col.drop_null()
            if len(valid) == 0:
                mn.append(None)
                mx.append(None)
            else:
                mm = pc.min_max(valid)
                mn.append(str(mm["min"].as_py()))
                mx.append(str(mm["max"].as_py()))
        return pa.table({
            "column": pa.array(names, pa.string()),
            "_n": pa.array(n, pa.int64()),
            "_nn": pa.array(nn, pa.int64()),
            "_mn": pa.array(mn, pa.string()),
            "_mx": pa.array(mx, pa.string())})

    partials = ds.map_batches(_partial, batch_format="pyarrow")

    def _combine(g: pd.DataFrame) -> pd.DataFrame:
        # strings compare lexically; numeric columns need numeric
        # compare — recompare as float when every value parses
        vals_mn = [v for v in g["_mn"] if v is not None]
        vals_mx = [v for v in g["_mx"] if v is not None]

        def _best(vals, take_max):
            if not vals:
                return None
            try:
                xs = [float(v) for v in vals]
                i = int(np.argmax(xs) if take_max else np.argmin(xs))
                return vals[i]
            except ValueError:
                return max(vals) if take_max else min(vals)

        return pd.DataFrame([{
            "column": g["column"].iloc[0],
            "n_rows": int(g["_n"].sum()),
            "n_null": int(g["_nn"].sum()),
            "min_val": _best(vals_mn, False),
            "max_val": _best(vals_mx, True)}])

    return partials.groupby("column").map_groups(
        _combine, batch_format="pandas")


def nonempty_arrow_blocks(ds) -> list[pa.Table]:
    """Materialized Arrow blocks of ``ds`` with zero-row blocks dropped.

    Ray's sort-based shuffle (groupby / sort / repartition(shuffle))
    can emit zero-row blocks whose schema is EMPTY (no columns at
    all) — indexing a column on such a block raises KeyError
    nondeterministically (depends on block-to-task placement, so it
    appears only at some CPU counts). Every ``to_arrow_refs`` consumer
    must go through this helper instead of fetching refs directly.
    """
    import ray

    blocks = ray.get(list(ds.to_arrow_refs()))
    return [b for b in blocks if b.num_rows > 0]


def nonempty_batches(ds, **kwargs):
    """``iter_batches(batch_format="pyarrow")`` with zero-row (possibly
    empty-schema) batches skipped — same defense as
    ``nonempty_arrow_blocks`` for streaming consumers."""
    for b in ds.iter_batches(batch_format="pyarrow", **kwargs):
        if b.num_rows > 0:
            yield b


def skip_empty(fn, schema: pa.Schema):
    """Wrap a ``map_batches`` fn so zero-row input blocks (which after a
    shuffle may carry an EMPTY schema and so cannot be column-indexed)
    short-circuit to a typed empty table with the declared output
    schema. Declaring the schema also keeps every output block
    schema-identical, silencing Ray's "RefBundle with a different
    schema" warnings for the stage."""
    def _wrapped(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return schema.empty_table()
        return fn(b)
    return _wrapped


def iter_cap(state_ds, floor: int = 16) -> int:
    """Per-round block cap for iterative BSP loops, taken ONCE from the
    materialized initial state so it scales with the data (node-table
    blocks grow with corpus size) but stays constant across rounds."""
    return max(floor, state_ds.num_blocks())


def estimate_num_blocks(ds) -> int | None:
    """Cheap plan-time block-count estimate: input bytes divided by the
    context's target block size. Parquet reads report 1 plan-time block
    (file splitting is decided at execution), so byte size is the only
    honest pre-execution signal; used to decide whether a reduce needs
    an intermediate tree-merge level, where approximate is fine."""
    from ray.data import DataContext

    from .joins import estimate_size_bytes

    sz = estimate_size_bytes(ds)
    if sz is None:
        return None
    tgt = DataContext.get_current().target_max_block_size or (128 << 20)
    return max(1, -(-sz // tgt))


def tree_merge(partials, merge_fn, fanin: int, num_blocks_hint: int | None):
    """Insert intermediate merge levels between per-block partials and a
    terminal single-block reduce, so the final reduce's fan-in is
    bounded by ``fanin`` regardless of block count (at 10^6 input
    blocks a single coalesce/driver merge receives 10^6 partials; the
    tree keeps every task's input ~fanin partials).

    ``merge_fn`` must be associative over whole partial blocks (it maps
    one coalesced Arrow block of partials to one merged partial block).
    Levels repeat until the (estimated) block count is within fanin;
    exactness is preserved because each level applies the same
    deterministic merge the terminal reduce would.
    """
    fanin = max(2, fanin)            # fanin 1 would never converge
    nb = num_blocks_hint
    while nb is not None and nb > fanin:
        nb = max(1, -(-nb // fanin))
        partials = coalesce_blocks(partials, nb).map_batches(
            merge_fn, batch_format="pyarrow", batch_size=None)
    return partials


def coalesce_blocks(ds, num_blocks: int):
    """Cap block count between BSP rounds. Ray's sort-based shuffle
    emits one output block per input block, so an iterate that unions
    its own previous state compounds blocks geometrically (measured
    16 -> 48 -> 112 -> 240 -> 496 over 4 BFS rounds at sf0.001, with
    per-round wall time x2.5 each round from pure task-scheduling
    overhead). A no-shuffle coalescing repartition between rounds
    keeps per-round cost constant; it moves only the node-sized state
    table, never the edge table."""
    return ds.repartition(num_blocks, shuffle=False)
