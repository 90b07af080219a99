"""Distributed sketches: HyperLogLog approximate distinct count.

The sketch pattern for web-scale cardinality: each batch collapses to a
fixed 2^p-byte register array (map_batches partial), registers merge by
elementwise max (associative and commutative, so combining is safe in
any order and under any partitioning), and the estimate is computed once
on the driver from the merged 4 KB array — a 10^12-row distinct count
moves O(batches x 4 KB), never rows. Standard HLL per Flajolet et al.
2007 with linear-counting small-range correction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(hashes: np.ndarray, p: int = 12) -> np.ndarray:
    """Register array (uint8, len 2^p) for a batch of uint64 hashes."""
    m = 1 << p
    h = hashes.astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad tail with 1s
    # rank = leading zeros of the remaining 64-p bits, + 1
    nbits = 64 - p
    rank = np.ones(len(h), dtype=np.uint8)
    probe = np.uint64(1) << np.uint64(63)
    zeros = np.zeros(len(h), dtype=np.uint8)
    live = np.ones(len(h), dtype=bool)
    for _ in range(nbits):
        bit = (rest & probe) != 0
        zeros[live & ~bit] += 1
        live &= ~bit
        if not live.any():
            break
        probe >>= np.uint64(1)
    rank = zeros + 1
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    est = _alpha(m) * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            return m * np.log(m / zeros)      # linear counting
    return float(est)


def approx_distinct(ds, hash_fn, p: int = 12) -> float:
    """Approximate distinct count of ``hash_fn(batch) -> uint64 array``.

    map_batches emits one register row per batch; the driver merges the
    tiny partials by elementwise max. Relative error ~1.04/sqrt(2^p)
    (~1.6% at p=12).
    """
    def _partial(batch: pa.Table) -> pa.Table:
        regs = hll_registers(hash_fn(batch), p)
        return pa.table({"regs": pa.array([regs], pa.list_(pa.uint8()))})

    merged = np.zeros(1 << p, dtype=np.uint8)
    parts = ds.map_batches(_partial, batch_format="pyarrow")
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        for r in b.column("regs").to_pylist():
            np.maximum(merged, np.asarray(r, dtype=np.uint8), out=merged)
    return hll_estimate(merged)


# ---------------------------------------------------------------------------
# Heavy hitters: space-saving candidates + exact recount (two passes)
# ---------------------------------------------------------------------------

def space_saving_counts(items, capacity: int) -> dict:
    """Metwally et al. space-saving summary of one partition's items.

    Guarantee used downstream: every item whose count in THIS partition
    exceeds n_partition / capacity is present in the summary.
    """
    counts: dict = {}
    for it in items:
        if it in counts:
            counts[it] += 1
        elif len(counts) < capacity:
            counts[it] = 1
        else:
            victim = min(counts, key=counts.get)
            counts[it] = counts.pop(victim) + 1
    return counts


def frequent_items_exact(ds, item_fn, phi: float = 0.005,
                         capacity: int | None = None):
    """EXACT heavy hitters (count >= phi * N) in two passes.

    Pass 1 runs a space-saving summary per batch (``capacity > 1/phi``,
    STRICTLY: space-saving only guarantees presence of items with batch
    count > n_batch / capacity, so capacity = floor(1/phi) + 1 makes
    count >= phi * n_batch imply count > n_batch / capacity) — by
    pigeonhole, any global phi-heavy item is phi-heavy in at least
    one batch, so the union of per-batch summaries is a SUPERSET of the
    true heavy hitters (bounded: capacity x batches rows, independent
    of N); the same pass carries each batch's item count, so the global
    N comes for free. Pass 2 broadcasts the candidate set and recounts
    EXACTLY with a vectorized membership filter + pre-aggregated
    groupby, then thresholds on the exact counts. Output is exact and
    deterministic — a plain ``GROUP BY ... HAVING count >= phi*N``
    replays it in SQL — while the full-cardinality item groupby (the
    thing that does not scale) never runs.

    ``item_fn(batch) -> sequence of string items``. Returns
    (DataFrame[item, n_occurrences], total_item_count).
    """
    import ray

    from ..functions.agg import grouped_count_sum

    capacity = capacity or max(64, int(np.floor(1.0 / phi)) + 1)
    _SENT = "\x00__total__"

    def _pass1(b: pa.Table) -> pa.Table:
        items = list(item_fn(b))
        cnt = space_saving_counts(items, capacity)
        return pa.table({
            "item": pa.array(list(cnt.keys()) + [_SENT], pa.string()),
            "_n": pa.array([0] * len(cnt) + [len(items)], pa.int64()),
        })

    summary = grouped_count_sum(
        ds.map_batches(_pass1, batch_format="pyarrow"),
        ["item"], ["_n"], count_alias="_rows").to_pandas()
    n_total = int(summary.loc[summary["item"] == _SENT, "_n_sum"].sum())
    candidates = np.array(
        sorted(summary.loc[summary["item"] != _SENT, "item"]), dtype=object)
    cand_ref = ray.put(candidates)

    def _pass2(b: pa.Table) -> pa.Table:
        cands = ray.get(cand_ref)
        items = np.asarray(list(item_fn(b)), dtype=object)
        kept = items[np.isin(items, cands)]
        return pa.table({"item": pa.array(kept.tolist(), pa.string())})

    agg = grouped_count_sum(
        ds.map_batches(_pass2, batch_format="pyarrow"),
        ["item"], [], count_alias="n_occurrences").to_pandas()
    out = agg[agg["n_occurrences"] >= phi * n_total]
    return (out.sort_values("item").reset_index(drop=True), n_total)
