"""Distributed Bloom filter build + Bloom-prefiltered exact semi-join.

The scale niche between the repo's two existing semi-join plans:

- ``broadcast_semi_join`` ships the whole sorted key ARRAY (8 B/key) —
  perfect while the key side fits comfortably in every worker's heap;
- ``bucketed_hash_join`` shuffles BOTH sides — always correct, but the
  big side pays an all-to-all exchange even when almost nothing joins.

A Bloom filter ships ~1.2 bytes/key at 1% false-positive rate — 6-7x
smaller than the key array — and prefilters the big side in place, so
only the (matches + false positives) sliver reaches the exact
verification join. The OUTPUT stays exact: survivors are confirmed
with ``broadcast_semi_join``/``bucketed_hash_join`` against the true
key set, so false positives never escape and a DuckDB ``IN`` replay
hash-matches bit for bit. Prefilter selectivity is measured and
``log``-able; the property test drives the FPR bound.

Build shape: one pass over the key Dataset produces per-block partial
bitmaps (fixed ``num_bits/8`` bytes each); the driver folds them with
a streaming ``iter_batches`` OR — driver memory is O(num_bits), never
O(keys). K hash probes come from double hashing (Kirsch–Mitzenmacher)
over two splitmix64-style mixes, vectorized per batch.

Public algorithm (Bloom 1970; Kirsch & Mitzenmacher 2006). No
reference counterpart — the reference has no join layer at all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_M1 = np.uint64(0x9E3779B97F4A7C15)
_M2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _mix(x: np.ndarray, mult: np.uint64) -> np.ndarray:
    u = x.astype(np.uint64)
    u = (u ^ (u >> np.uint64(30))) * mult
    u = (u ^ (u >> np.uint64(27))) * _M1
    return u ^ (u >> np.uint64(31))


def optimal_params(num_keys: int, fpr: float = 0.01) -> tuple[int, int]:
    """(num_bits, num_hashes) for a target false-positive rate; bits
    rounded up to a whole number of uint64 words."""
    n = max(num_keys, 1)
    m = int(np.ceil(-n * np.log(fpr) / (np.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, int(round(m / n * np.log(2))))
    return m, k


def _probe_positions(keys: np.ndarray, num_bits: int,
                     num_hashes: int) -> np.ndarray:
    """(num_hashes, len(keys)) bit positions via double hashing."""
    h1 = _mix(keys, _M1)
    h2 = _mix(keys, _M2) | np.uint64(1)   # odd => full-period stepping
    i = np.arange(num_hashes, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :])
            % np.uint64(num_bits)).astype(np.int64)


def _set_bits(words: np.ndarray, pos: np.ndarray) -> None:
    flat = pos.ravel()
    np.bitwise_or.at(words, flat >> 6,
                     np.uint64(1) << (flat.astype(np.uint64)
                                      & np.uint64(63)))


def _test_bits(words: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """AND over the k probes -> membership mask per key."""
    bit = (words[pos >> 6] >> (pos.astype(np.uint64) & np.uint64(63))
           ) & np.uint64(1)
    return bit.all(axis=0)


def build_bloom(keys_ds, key_col: str, num_bits: int,
                num_hashes: int) -> np.ndarray:
    """uint64 bitmap of ``num_bits`` bits over a key Dataset. One pass:
    per-block partial bitmaps, folded on the driver with a streaming
    OR (driver memory = one bitmap regardless of key count)."""
    words = num_bits // 64

    def _partial(b: pa.Table) -> pa.Table:
        w = np.zeros(words, dtype=np.uint64)
        if b.num_rows:                        # post-shuffle zero-row
            k = b.column(key_col).to_numpy().astype(np.int64)
            _set_bits(w, _probe_positions(k, num_bits, num_hashes))
        return pa.table({"bits": pa.array([w.tobytes()], pa.binary())})

    from .agg import nonempty_batches
    acc = np.zeros(words, dtype=np.uint64)
    for part in nonempty_batches(
            keys_ds.map_batches(_partial, batch_format="pyarrow")):
        for buf in part.column("bits").to_pylist():
            acc |= np.frombuffer(buf, dtype=np.uint64)
    return acc


def bloom_semi_join(big_ds, key_col: str, keys_ds, keys_col: str,
                    fpr: float = 0.01, num_keys_hint: int | None = None):
    """EXACT semi-join of ``big_ds`` against the keys of ``keys_ds``:
    a broadcast Bloom bitmap prefilters the big side in place, then
    the surviving sliver is confirmed against the true key set. Also
    returns nothing probabilistic — false positives die in the exact
    stage. Returns (result_ds, stats dict)."""
    import ray

    from .joins import bucketed_hash_join

    keys_ds = keys_ds.materialize()
    n_keys = num_keys_hint or keys_ds.count()
    num_bits, num_hashes = optimal_params(n_keys, fpr)
    bits = build_bloom(keys_ds, keys_col, num_bits, num_hashes)
    bits_ref = ray.put(bits)

    def _prefilter(b: pa.Table) -> pa.Table:
        w = ray.get(bits_ref)
        k = b.column(key_col).to_numpy().astype(np.int64)
        if not len(k):
            return b
        return b.filter(pa.array(
            _test_bits(w, _probe_positions(k, num_bits, num_hashes))))

    survivors = big_ds.map_batches(_prefilter, batch_format="pyarrow")
    # exact confirm WITHOUT ever collecting the key array: the sliver
    # (matches + false positives only) meets the DISTINCT keys in one
    # bucketed shuffle — the whole point is that neither the big side
    # nor the key array ships anywhere whole
    distinct = keys_ds.groupby(keys_col).count().map_batches(
        lambda b: pa.table({"_bloomkey": pc.cast(
            b.column(keys_col), pa.int64())}),
        batch_format="pyarrow")
    joined = bucketed_hash_join(survivors, distinct, key_col, "_bloomkey")
    exact = joined.map_batches(
        lambda b: b.rename_columns(
            [key_col if c == "_key" else c for c in b.column_names]),
        batch_format="pyarrow")
    stats = {"num_bits": num_bits, "num_hashes": num_hashes,
             "bitmap_bytes": num_bits // 8, "keys": int(n_keys)}
    return exact, stats
