"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Training-data-pipeline operators (task brief "Deduplication"). Shapes:

- exact: content hash -> hash-partitioned groupby, first-wins
  (geoflow.pipelines.flagship.dedup_exact).
- MinHash+LSH: per-batch signatures (vectorized universal hashing over
  word-shingle hashes, ``np.minimum.reduceat`` across doc boundaries)
  -> explode to (band_id, band_hash, doc_id) rows -> groupby band
  bucket -> candidate pairs -> EXACT-Jaccard verification whose texts
  are fetched via a broadcast semi-join (candidate ids only) + bucketed
  hash joins. The LSH shuffle moves only the tiny band rows; text moves
  only for candidate pairs; NOTHING corpus-sized ever lands on the
  driver (the round-1 driver-dict verify path is gone).
- SimHash: 64-bit sign-of-weighted-sum signature; candidates via
  4x16-bit band pigeonhole (catches all pairs with Hamming distance
  <= 3), verified by popcount.
- embedding near-dup: blocked matmul per batch against a broadcast
  (ray.put) unit-normalized matrix -> pairs with cosine >= tau.

Pair outputs are canonical (id_a < id_b) and deduplicated, so results
are independent of block layout and batch order.
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pandas as pd
import pyarrow as pa

_LOG = logging.getLogger(__name__)

# 31-bit Mersenne prime: (a*h + b) with a, h < 2^31 stays under 2^62,
# so the whole universal-hash family runs in native uint64 (the round-1
# 61-bit modulus forced Python-bigint object arrays — the minhash hot
# spot). Signature VALUES changed; pair semantics did not (candidates
# are re-verified with exact Jaccard).
_P31 = np.uint64((1 << 31) - 1)
_EMPTY_SIG = np.iinfo(np.uint64).max


def _mod_p31(x: np.ndarray) -> np.ndarray:
    """x mod (2^31 - 1) for x < 2^62, via Mersenne folding (two shifts +
    adds instead of a hardware modulo — the minhash inner-loop op)."""
    x = (x & _P31) + (x >> np.uint64(31))
    x = (x & _P31) + (x >> np.uint64(31))
    return np.where(x >= _P31, x - _P31, x)


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """64-bit hashes of word k-shingles (k consecutive tokens)."""
    toks = (text or "").split()
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
    return out


def _perm_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_P31), size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_P31), size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a, b, num_perm: int) -> np.ndarray:
    """min over shingles of (a*h + b) mod p, per permutation (vectorized)."""
    if len(shingles) == 0:
        return np.full(num_perm, _EMPTY_SIG, dtype=np.uint64)
    h = _mod_p31(shingles.astype(np.uint64))[None, :]
    vals = _mod_p31(a[:, None] * h + b[:, None])
    return vals.min(axis=1)


def minhash_batch(batch: pa.Table, id_col: str, text_col: str = "text",
                  num_perm: int = 96, shingle_k: int = 3) -> pa.Table:
    """ids + minhash signatures per row (signature as fixed-len list).

    Vectorized across the WHOLE batch: all docs' shingle hashes are
    concatenated and each permutation chunk is reduced per doc with
    ``np.minimum.reduceat`` — no per-doc Python beyond shingling.
    """
    a, b = _perm_params(num_perm)
    ids = batch.column(id_col)
    texts = batch.column(text_col).to_pylist()
    sh_list = [_shingle_hashes(t, shingle_k) for t in texts]
    lens = np.array([len(s) for s in sh_list], dtype=np.int64)
    sigs = np.full((num_perm, len(texts)), _EMPTY_SIG, dtype=np.uint64)
    nz = np.nonzero(lens > 0)[0]
    if len(nz):
        concat = _mod_p31(np.concatenate([sh_list[i] for i in nz]))
        bnd = np.concatenate(([0], np.cumsum(lens[nz])[:-1]))
        # chunk permutations so the (chunk, shingles) matrix stays small
        chunk = max(1, min(num_perm, (4 << 20) // max(len(concat), 1)))
        for lo in range(0, num_perm, chunk):
            hi = min(lo + chunk, num_perm)
            vals = _mod_p31(a[lo:hi, None] * concat[None, :]
                            + b[lo:hi, None])
            sigs[np.ix_(np.arange(lo, hi), nz)] = \
                np.minimum.reduceat(vals, bnd, axis=1)
    return pa.table({
        id_col: ids,
        "sig": pa.array(list(sigs.T), pa.list_(pa.uint64())),
    })


def explode_bands(batch: pa.Table, id_col: str, num_bands: int = 16) -> pa.Table:
    """signature rows -> (band_id, band_hash, id) rows for the LSH shuffle."""
    ids = batch.column(id_col).to_numpy()
    sig_col = batch.column("sig")
    chunks = sig_col.chunks if isinstance(sig_col, pa.ChunkedArray) else [sig_col]
    # .flatten() (not .values) is slice-offset-aware: a sliced ListArray
    # chunk's .values spans the WHOLE backing buffer and would misalign
    # ids to signatures
    flat = np.concatenate(
        [c.flatten().to_numpy(zero_copy_only=False) for c in chunks])
    num_perm = len(flat) // max(len(ids), 1) if len(ids) else 0
    rows_per_band = num_perm // num_bands
    sig = flat.reshape(len(ids), num_perm)
    # Zero-shingle docs all carry the identical all-_EMPTY_SIG signature
    # (a sentinel no real signature can take: values are mod p31), so
    # every band would co-bucket them and the candidate stage would emit
    # O(m^2) pairs among empty docs — all later rejected at Jaccard 0.
    # They can never pass a positive threshold; drop them here.
    if len(ids):
        nonempty = sig[:, 0] != _EMPTY_SIG
        ids, sig = ids[nonempty], sig[nonempty]
    out_id, out_band, out_hash = [], [], []
    for band in range(num_bands):
        piece = sig[:, band * rows_per_band:(band + 1) * rows_per_band]
        # mix the band rows into one 64-bit bucket key
        bh = np.zeros(len(ids), dtype=np.uint64)
        for j in range(rows_per_band):
            bh = bh * np.uint64(1099511628211) + piece[:, j]
        out_id.append(ids)
        out_band.append(np.full(len(ids), band, dtype=np.int32))
        out_hash.append(bh)
    return pa.table({
        id_col: pa.array(np.concatenate(out_id) if out_id else []),
        "band_id": pa.array(np.concatenate(out_band) if out_band else [],
                            pa.int32()),
        "band_hash": pa.array(np.concatenate(out_hash) if out_hash else [],
                              pa.uint64()),
    })


def candidate_pairs_from_buckets(id_col: str):
    """map_groups fn: bucket rows -> canonical candidate id pairs."""
    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g[id_col].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype(np.int64)
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})
    return _pairs


def _mix_cols(*cols) -> np.ndarray:
    """Combine int columns into one well-mixed uint64 (splitmix-style)."""
    h = np.zeros(len(cols[0]), dtype=np.uint64)
    for c in cols:
        h ^= np.asarray(c).astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15) \
            + (h << np.uint64(6)) + (h >> np.uint64(2))
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    return h


def lsh_candidate_pairs(bands_ds, id_col: str, num_buckets: int = 64):
    """(id, band_id, band_hash) rows -> DISTINCT canonical candidate
    pairs, using TWO bounded-cardinality shuffles.

    A naive ``groupby(["band_id", "band_hash"]).map_groups`` spawns one
    pandas call per LSH bucket — with rows ~= docs x bands that is one
    call per (mostly singleton) bucket and the per-group overhead
    dominates the whole dedup pipeline. Instead the shuffle key is
    ``hash(band_id, band_hash) % num_buckets`` (all rows of one LSH
    bucket still co-locate) and each of the O(num_buckets) groups emits
    pairs for ALL its buckets vectorized: sort once, find segment
    boundaries with np.diff, and only touch segments of size >= 2.
    Pair dedup (same pair from several bands) uses the same trick keyed
    on hash(id_a, id_b).
    """
    def _tag(b: pa.Table) -> pa.Table:
        gb = _mix_cols(b.column("band_id").to_numpy(),
                       b.column("band_hash").to_numpy()) \
            % np.uint64(num_buckets)
        return b.append_column("_gb", pa.array(gb.astype(np.int32)))

    def _emit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band_id", "band_hash", id_col], kind="mergesort")
        bid = g["band_id"].to_numpy()
        bh = g["band_hash"].to_numpy().astype(np.uint64)
        ids = g[id_col].to_numpy().astype(np.int64)
        change = np.nonzero((np.diff(bid) != 0) | (np.diff(bh) != 0))[0] + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(g)]))
        sizes = ends - starts
        out_a, out_b = [], []
        for s, e in zip(starts[sizes >= 2], ends[sizes >= 2]):
            seg = np.unique(ids[s:e])
            if len(seg) >= 2:
                ia, ib = np.triu_indices(len(seg), k=1)
                out_a.append(seg[ia])
                out_b.append(seg[ib])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                 "id_b": pd.Series(dtype=np.int64)})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)})

    cands = bands_ds.map_batches(_tag, batch_format="pyarrow") \
        .groupby("_gb").map_groups(_emit, batch_format="pandas")

    def _tag_pair(b: pa.Table) -> pa.Table:
        pb = _mix_cols(b.column("id_a").to_numpy(),
                       b.column("id_b").to_numpy()) % np.uint64(num_buckets)
        return b.append_column("_pb", pa.array(pb.astype(np.int32)))

    def _distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b"]]

    return cands.map_batches(_tag_pair, batch_format="pyarrow") \
        .groupby("_pb").map_groups(_distinct, batch_format="pandas")


def minhash_lsh_pairs(ds, id_col: str, text_col: str = "text",
                      num_perm: int = 96, num_bands: int = 32,
                      jaccard_threshold: float = 0.5,
                      shingle_k: int = 3):
    """Full MinHash-LSH near-dup pipeline -> verified pairs Dataset
    (id_a, id_b, jaccard — EXACT shingle Jaccard, not the estimate).

    Scale shape (nothing corpus-sized touches the driver):

    1. signatures + band explode: tiny (id, band, hash) rows shuffle
       through ONE groupby; candidate pairs come out of the buckets.
    2. the candidate id set (post-LSH, bounded) is collected via a
       distributed ``unique`` and broadcast (``ray.put``) into a
       semi-join that filters the corpus down to candidate texts in one
       streaming pass — the full text column never shuffles.
    3. two bucketed hash joins attach text_a/text_b to each pair; exact
       Jaccard is computed per pair row and thresholds the output.

    Default r=3 x 32 bands (96 perms): candidate-recall at Jaccard 0.7
    is 1 - (1 - 0.7^3)^32 ~ 0.999997, so near-dup pairs (which sit well
    above 0.7 by construction of "near-duplicate") are caught
    deterministically; exact verification removes false positives.
    """
    import ray

    from ..functions.joins import broadcast_semi_join, bucketed_hash_join

    docs = ds.map_batches(
        lambda b: b.select([id_col, text_col]), batch_format="pyarrow")
    sigs = docs.map_batches(
        lambda b: minhash_batch(b, id_col, text_col, num_perm, shingle_k),
        batch_format="pyarrow", batch_size=1024)
    bands = sigs.map_batches(
        lambda b: explode_bands(b, id_col, num_bands), batch_format="pyarrow")
    cands = lsh_candidate_pairs(bands, id_col).materialize()

    ids_a = cands.unique("id_a") or []   # unique() is None on empty input
    ids_b = cands.unique("id_b") or []
    cand_ids = np.asarray(sorted(set(ids_a) | set(ids_b)), dtype=np.int64)
    if len(cand_ids) == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64())}))
    cand_texts = broadcast_semi_join(docs, id_col, cand_ids)

    ta = cand_texts.map_batches(
        lambda b: pa.table({"_ida": pc_cast_i64(b.column(id_col)),
                            "text_a": b.column(text_col)}),
        batch_format="pyarrow")
    tb = cand_texts.map_batches(
        lambda b: pa.table({"_idb": pc_cast_i64(b.column(id_col)),
                            "text_b": b.column(text_col)}),
        batch_format="pyarrow")
    j1 = bucketed_hash_join(cands, ta, "id_a", "_ida", num_buckets=16)
    j1 = j1.map_batches(
        lambda b: b.rename_columns(
            ["id_a" if c == "_key" else c for c in b.column_names]),
        batch_format="pyarrow")
    j2 = bucketed_hash_join(j1, tb, "id_b", "_idb", num_buckets=16)
    j2 = j2.map_batches(
        lambda b: b.rename_columns(
            ["id_b" if c == "_key" else c for c in b.column_names]),
        batch_format="pyarrow")

    def _verify(b: pa.Table) -> pa.Table:
        jac = np.empty(len(b), dtype=np.float64)
        for i, (t1, t2) in enumerate(zip(b.column("text_a").to_pylist(),
                                         b.column("text_b").to_pylist())):
            jac[i] = ngram_jaccard(t1, t2, shingle_k)
        out = pa.table({
            "id_a": b.column("id_a"), "id_b": b.column("id_b"),
            "jaccard": pa.array(jac),
        })
        return out.filter(pa.array(jac >= jaccard_threshold))

    return j2.map_batches(_verify, batch_format="pyarrow")


def pc_cast_i64(col):
    import pyarrow.compute as pc
    return pc.cast(col, pa.int64())


# ---------------------------------------------------------------------------
# Duplicate clusters: connected components over near-dup pairs
# ---------------------------------------------------------------------------

def dup_components_driver(pairs: pd.DataFrame) -> pd.DataFrame:
    """Union-find on the driver — valid when the candidate PAIR set is
    provably small (it is: pairs are post-LSH, post-verification).
    -> rows (doc_id, component) with component = min id of the cluster."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    ids = sorted(set(pairs["id_a"]) | set(pairs["id_b"]))
    return pd.DataFrame({"doc_id": ids,
                         "component": [find(i) for i in ids]})


def dup_components(pairs_ds, max_iters: int = 10,
                   driver_limit: int = 2_000_000):
    """Connected components over near-dup pairs.

    The input is the POST-LSH, POST-VERIFICATION pair set — an
    aggregate bounded by the true duplicate structure, not by corpus
    size. Below ``driver_limit`` edges the driver union-find is both
    exact and orders of magnitude cheaper than iterated distributed
    joins (each propagation round costs several full Ray executions of
    fixed overhead); above it, distributed min-label propagation takes
    over. Only edge (id) rows ever reach the driver — never texts or
    signatures.
    """
    n_edges = pairs_ds.count()
    if n_edges <= driver_limit:
        import ray.data as rd
        pairs = pairs_ds.to_pandas()
        if len(pairs) == 0:
            return rd.from_arrow(pa.table({
                "doc_id": pa.array([], pa.int64()),
                "component": pa.array([], pa.int64())}))
        return rd.from_pandas(dup_components_driver(pairs))
    return _dup_components_distributed(pairs_ds, max_iters)


def _dup_components_distributed(pairs_ds, max_iters: int = 10):
    """Distributed min-label propagation (the 10^12-doc path).

    Each round: every node sends its current label across its edges,
    then keeps the min of what it heard (groupby(id).min(label)). A
    chain of length L converges in <= L rounds; LSH dup clusters are
    shallow (near-cliques), so a handful of rounds suffices. One
    bucketed join + one groupby per round; stops early when the global
    label sum is unchanged.
    """
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    from ..functions.agg import coalesce_blocks, iter_cap
    from ..functions.joins import bucketed_hash_join

    def _edges_both(b: pa.Table) -> pa.Table:
        a = b.column("id_a").to_numpy()
        c = b.column("id_b").to_numpy()
        return pa.table({
            "src": pa.array(np.concatenate([a, c]), pa.int64()),
            "dst": pa.array(np.concatenate([c, a]), pa.int64()),
        })

    edges = pairs_ds.map_batches(_edges_both, batch_format="pyarrow")
    edges = edges.materialize()
    labels = edges.groupby("src").aggregate(
        Min("dst", alias_name="_m")).map_batches(
        lambda b: pa.table({
            "id": b.column("src"),
            "label": pa.array(
                np.minimum(b.column("src").to_numpy(),
                           b.column("_m").to_numpy()), pa.int64()),
        }), batch_format="pyarrow").materialize()
    cap = iter_cap(labels)

    prev_sum = None
    for _ in range(max_iters):
        cur = labels.aggregate(Sum("label"))["sum(label)"]
        if cur == prev_sum:
            break
        prev_sum = cur
        heard = bucketed_hash_join(
            edges, labels.map_batches(
                lambda b: pa.table({"id2": b.column("id"),
                                    "label": b.column("label")}),
                batch_format="pyarrow"),
            "src", "id2", num_buckets=16)
        # heard: (_key=src, dst, label-of-src); nodes keep min over
        # their own label and everything they heard
        candidates = heard.map_batches(
            lambda b: pa.table({"id": b.column("dst"),
                                "label": b.column("label")}),
            batch_format="pyarrow").union(labels)
        # coalesce between rounds: the sort shuffle emits one block per
        # input block, so label blocks would compound geometrically
        # round-over-round (see functions.agg.coalesce_blocks)
        labels = coalesce_blocks(
            candidates.groupby("id").aggregate(
                Min("label", alias_name="label")), cap).materialize()
    return labels.map_batches(
        lambda b: pa.table({"doc_id": b.column("id"),
                            "component": b.column("label")}),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

# Dual polynomial token hash (SQL-replayable SimHash): two independent
# char-polynomial folds mod primes just under 2^32 supply the low and
# high 32 bits of the per-token 64-bit hash. Every fold step is exact
# integer arithmetic DuckDB replays verbatim with list_reduce + bit ops
# (same trick as textstats' winnowing fingerprint), which is what turns
# the SimHash pair set into a hash-matchable oracle query.
_SH_P1 = 4294967291   # largest prime < 2^32
_SH_P2 = 4294967279   # second-largest prime < 2^32
_SH_B1 = 31
_SH_B2 = 37
_POW_CACHE: dict = {}


def _pow_mod_table(base: int, mod: int, n: int) -> np.ndarray:
    """[base^0, ..., base^(n-1)] mod ``mod`` as int64 (cached, grown)."""
    key = (base, mod)
    tbl = _POW_CACHE.get(key)
    if tbl is None or len(tbl) < n:
        m = max(n, 256)
        out = np.empty(m, dtype=np.int64)
        acc = 1
        for i in range(m):
            out[i] = acc
            acc = (acc * base) % mod
        tbl = _POW_CACHE[key] = out
    return tbl


def dual_poly_token_hashes(toks: list[str]) -> np.ndarray:
    """Per-token uint64 hash h1 | (h2 << 32) where
    h = fold(acc * B + ord(ch)) % P over the token's code points —
    vectorized over ALL tokens at once via exponent-weighted reduceat."""
    lens = np.fromiter((len(w) for w in toks), dtype=np.int64,
                       count=len(toks))
    total = int(lens.sum())
    if total == 0:     # all-empty tokens cannot occur via str.split()
        return np.zeros(len(toks), dtype=np.uint64)
    codes = np.fromiter((ord(c) for w in toks for c in w),
                        dtype=np.int64, count=total)
    ends = np.cumsum(lens)
    starts = ends - lens
    # exponent of char at position i within its token: len - 1 - i
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    e = np.repeat(lens, lens) - 1 - pos
    maxlen = int(lens.max())
    h = np.zeros(len(toks), dtype=np.uint64)
    for base, p, shift in ((_SH_B1, _SH_P1, 0), (_SH_B2, _SH_P2, 32)):
        pw = _pow_mod_table(base, p, maxlen)
        # terms < 2^21 (code point) * 2^32 (power) < 2^53: exact in int64;
        # per-token sums < len * 2^32: exact for any realistic token
        terms = (codes % p) * pw[e] % p
        hs = np.add.reduceat(terms, starts) % p
        h |= hs.astype(np.uint64) << np.uint64(shift)
    return h


def simhash_batch(batch: pa.Table, id_col: str, text_col: str = "text",
                  token_hash: str = "poly") -> pa.Table:
    """64-bit SimHash per row over token hashes (sign of weighted bit
    sums). Per-doc numpy kernels on purpose: the (tokens, 64) bit
    matrix stays cache-resident per doc, which measured 50x faster than
    a batch-wide ``np.add.reduceat(axis=0)`` formulation (reduceat's
    non-contiguous 2-D inner loop dominates at this shape).

    ``token_hash="poly"`` (default) uses the SQL-replayable dual
    polynomial hash so the whole near-dup pair set has an exact DuckDB
    oracle; ``"blake2"`` keeps the stronger-mixing cryptographic
    alternative (no SQL replay)."""
    ids = batch.column(id_col)
    out = np.empty(len(ids), dtype=np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(batch.column(text_col).to_pylist()):
        toks = (t or "").split()
        if not toks:
            out[i] = 0
            continue
        if token_hash == "poly":
            hs = dual_poly_token_hashes(toks)
        else:
            hs = np.fromiter(
                (int.from_bytes(
                    hashlib.blake2b(w.encode(), digest_size=8).digest(),
                    "big") for w in toks),
                dtype=np.uint64, count=len(toks))
        bitmat = ((hs[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64)
        sums = (2 * bitmat - 1).sum(axis=0)
        out[i] = np.uint64(((sums > 0).astype(np.uint64) << bits).sum())
    return pa.table({id_col: ids, "simhash": pa.array(out, pa.uint64())})


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over uint64."""
    x = x.astype(np.uint64, copy=True)
    x -= (x >> np.uint64(1)) & np.uint64(0x5555555555555555)
    x = (x & np.uint64(0x3333333333333333)) \
        + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)) \
        .astype(np.int64)


def _simhash_segment_pairs(ids: np.ndarray, sh: np.ndarray, band: int,
                           max_hamming: int, cap: int, depth: int = 0):
    """Pairs within one LSH bucket, comparing UNIQUE signatures only.

    - identical signatures collapse first (their member pairs are
      hamming-0 and emitted directly; the all-pairs comparison then runs
      over unique signatures, so bucket cost is O(uniq^2) not O(n^2) —
      at corpus scale exact-dup collapse bounds uniq far below n);
    - if uniq still exceeds ``cap``, the bucket is split on the 16 bits
      of the NEXT band and recursed (pigeonhole trade, documented: a
      d<=max_hamming pair is only missed if every band where it agrees
      is over-cap AND its differing bits fall in that band's splitter;
      recall for exact-signature pairs is always 1).
    """
    usig, inv = np.unique(sh, return_inverse=True)
    out_a, out_b, out_h = [], [], []
    counts = np.bincount(inv)
    for v in np.nonzero(counts >= 2)[0]:
        mem = np.unique(ids[inv == v])
        if len(mem) >= 2:
            ia, ib = np.triu_indices(len(mem), k=1)
            out_a.append(mem[ia])
            out_b.append(mem[ib])
            out_h.append(np.zeros(len(ia), dtype=np.int64))
    if len(usig) >= 2:
        if len(usig) > cap and depth < 3:
            nxt = (band + 1 + depth) % 4
            sub = (usig >> np.uint64(16 * nxt)) & np.uint64(0xFFFF)
            # split members by their signature's sub-key
            row_sub = sub[inv]
            for key in np.unique(sub):
                m = row_sub == key
                a, b, h = _simhash_segment_pairs(
                    ids[m], sh[m], band, max_hamming, cap, depth + 1)
                if len(a):
                    out_a.append(a)
                    out_b.append(b)
                    out_h.append(h)
        else:
            ia, ib = np.triu_indices(len(usig), k=1)
            ham = popcount64(usig[ia] ^ usig[ib])
            keep = (ham >= 1) & (ham <= max_hamming)
            if keep.any():
                # expand each kept unique-sig pair to member id pairs
                members = [np.unique(ids[inv == v])
                           for v in range(len(usig))]
                for va, vb, hm in zip(ia[keep], ib[keep], ham[keep]):
                    ga, gb = members[va], members[vb]
                    aa = np.repeat(ga, len(gb))
                    bb = np.tile(gb, len(ga))
                    lo = np.minimum(aa, bb)
                    hi = np.maximum(aa, bb)
                    out_a.append(lo)
                    out_b.append(hi)
                    out_h.append(np.full(len(lo), hm, dtype=np.int64))
    if not out_a:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    return (np.concatenate(out_a), np.concatenate(out_b),
            np.concatenate(out_h))


def simhash_pairs(ds, id_col: str, text_col: str = "text",
                  max_hamming: int = 3, num_buckets: int = 64,
                  bucket_cap: int = 4096):
    """Near-dup pairs with Hamming distance <= max_hamming (<=15 supported
    by the 4x16-bit pigeonhole banding).

    Shuffle shape mirrors ``lsh_candidate_pairs``: O(num_buckets) groups
    keyed on hash(band, band_hash), vectorized segment processing inside
    (no per-LSH-bucket pandas overhead); per-bucket pair cost is bounded
    by the unique-signature collapse + ``bucket_cap`` splitting (see
    _simhash_segment_pairs).
    """
    sigs = ds.map_batches(
        lambda b: simhash_batch(b, id_col, text_col), batch_format="pyarrow")

    def _bands(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        sh = batch.column("simhash").to_numpy()
        parts = []
        for band in range(4):
            chunk = (sh >> np.uint64(16 * band)) & np.uint64(0xFFFF)
            gb = _mix_cols(np.full(len(ids), band, dtype=np.int64),
                           chunk) % np.uint64(num_buckets)
            parts.append(pa.table({
                id_col: pa.array(ids),
                "simhash": pa.array(sh, pa.uint64()),
                "band_id": pa.array(np.full(len(ids), band, dtype=np.int32)),
                "band_hash": pa.array(chunk, pa.uint64()),
                "_gb": pa.array(gb.astype(np.int32)),
            }))
        return pa.concat_tables(parts)

    bands = sigs.map_batches(_bands, batch_format="pyarrow")

    def _emit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band_id", "band_hash", id_col], kind="mergesort")
        bid = g["band_id"].to_numpy()
        bh = g["band_hash"].to_numpy().astype(np.uint64)
        ids = g[id_col].to_numpy().astype(np.int64)
        sh = g["simhash"].to_numpy().astype(np.uint64)
        change = np.nonzero((np.diff(bid) != 0) | (np.diff(bh) != 0))[0] + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(g)]))
        sizes = ends - starts
        out_a, out_b, out_h = [], [], []
        for s, e in zip(starts[sizes >= 2], ends[sizes >= 2]):
            a, b, h = _simhash_segment_pairs(
                ids[s:e], sh[s:e], int(bid[s]), max_hamming, bucket_cap)
            if len(a):
                out_a.append(a)
                out_b.append(b)
                out_h.append(h)
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                 "id_b": pd.Series(dtype=np.int64),
                                 "hamming": pd.Series(dtype=np.int64)})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "hamming": np.concatenate(out_h)})

    pairs = bands.groupby("_gb").map_groups(_emit, batch_format="pandas")

    def _tag_pair(b: pa.Table) -> pa.Table:
        pb = _mix_cols(b.column("id_a").to_numpy(),
                       b.column("id_b").to_numpy()) % np.uint64(num_buckets)
        return b.append_column("_pb", pa.array(pb.astype(np.int32)))

    def _distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"])[
            ["id_a", "id_b", "hamming"]]

    return pairs.map_batches(_tag_pair, batch_format="pyarrow") \
        .groupby("_pb").map_groups(_distinct, batch_format="pandas")


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup / n-gram Jaccard
# ---------------------------------------------------------------------------

def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact word-k-shingle Jaccard between two texts."""
    A = set(_shingle_hashes(a, k).tolist())
    B = set(_shingle_hashes(b, k).tolist())
    return len(A & B) / max(len(A | B), 1)


def bucket_pair_partials(g: pd.DataFrame, max_df: int | None = None
                         ) -> pd.DataFrame:
    """One shingle bucket's postings -> per-pair partial intersection
    counts. Module-level so the DF-cap bound is directly testable.

    ``max_df`` drops shingles whose document frequency (exact within the
    bucket — ALL postings of a shingle co-locate here) exceeds the cap
    BEFORE the O(df^2) self-merge, bounding the bucket's emitted pair
    partials by sum(df^2) over KEPT shingles <= max_df * len(kept
    postings). Dropped boilerplate shingles no longer contribute to
    intersections (per-doc set sizes are untouched), so capped Jaccard
    is a LOWER bound on the exact value — the standard web-dedup DF-cap
    semantics. The count of dropped shingles is logged per bucket.
    """
    if max_df is not None:
        df = g.groupby("sh")["doc"].transform("size")
        over = df > max_df
        n_over = int(over.sum())
        if n_over:
            _LOG.info("jaccard DF cap: dropped %d postings (%d shingles) "
                      "with df > %d in one bucket", n_over,
                      g.loc[over, "sh"].nunique(), max_df)
            g = g[~over]
    g = g.sort_values(["sh", "doc"], kind="mergesort")
    m = g.merge(g, on="sh", suffixes=("_a", "_b"))
    m = m[m["doc_a"] < m["doc_b"]]
    return (m.groupby(["doc_a", "doc_b", "nsh_a", "nsh_b"], sort=False)
            .size().rename("i").reset_index())


def jaccard_pairs_exact(ds, id_col: str, text_col: str = "text",
                        threshold: float = 0.5, shingle_k: int = 3,
                        num_buckets: int = 64, max_df: int | None = None):
    """EXACT all-pairs shingle Jaccard >= threshold, distributed via an
    inverted index (the non-approximate twin of ``minhash_lsh_pairs`` —
    hash-matching the same oracle proves the LSH path's recall is 1).

    Plan (a distributed SQL join on shingles): docs explode to
    (shingle_hash, doc_id, doc_shingle_count) postings; ONE groupby on
    hash(shingle) buckets co-locates each shingle's postings; per
    bucket, a vectorized self-merge emits per-pair partial intersection
    counts; a second bounded-key groupby sums them and the Jaccard
    closes from the carried per-doc set sizes. Shuffle volume is the
    postings (16 B/shingle), never text.

    Cost is driven by shingle document frequency: one boilerplate
    shingle shared by 10^5 docs would create 10^10 pair partials in a
    single group. ``max_df`` is the web-scale guard — shingles with
    df > max_df are dropped (and logged) before the self-merge, which
    bounds per-bucket work at max_df * postings and turns the output
    Jaccard into a lower bound (see ``bucket_pair_partials``). The
    exact-oracle query keeps ``max_df=None`` at verification scale.
    """
    def _postings(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy().astype(np.int64)
        sh_list = [np.unique(_shingle_hashes(t, shingle_k))
                   for t in b.column(text_col).to_pylist()]
        lens = np.array([len(s) for s in sh_list], dtype=np.int64)
        if lens.sum() == 0:
            return pa.table({"sh": pa.array([], pa.int64()),
                             "doc": pa.array([], pa.int64()),
                             "nsh": pa.array([], pa.int64()),
                             "_gb": pa.array([], pa.int32())})
        sh = np.concatenate([s for s in sh_list if len(s)])
        doc = np.repeat(ids, lens)
        nsh = np.repeat(lens, lens)
        gb = (_mix_cols(sh) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table({"sh": pa.array(sh.view(np.int64), pa.int64()),
                         "doc": pa.array(doc, pa.int64()),
                         "nsh": pa.array(nsh, pa.int64()),
                         "_gb": pa.array(gb)})

    def _pair_partials(g: pd.DataFrame) -> pd.DataFrame:
        return bucket_pair_partials(g, max_df)

    def _tag_pair(b: pa.Table) -> pa.Table:
        pb = _mix_cols(b.column("doc_a").to_numpy(),
                       b.column("doc_b").to_numpy()) % np.uint64(num_buckets)
        return b.append_column("_pb", pa.array(pb.astype(np.int32)))

    def _finalize(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.groupby(["doc_a", "doc_b", "nsh_a", "nsh_b"], sort=False)
             ["i"].sum().reset_index())
        jac = s["i"] / (s["nsh_a"] + s["nsh_b"] - s["i"])
        keep = jac >= threshold
        return pd.DataFrame({"id_a": s["doc_a"][keep],
                             "id_b": s["doc_b"][keep],
                             "jaccard": jac[keep]})

    postings = ds.map_batches(_postings, batch_format="pyarrow")
    partials = postings.groupby("_gb").map_groups(
        _pair_partials, batch_format="pandas")
    out = partials.map_batches(_tag_pair, batch_format="pyarrow") \
        .groupby("_pb").map_groups(_finalize, batch_format="pandas")
    # schema seed: with zero surviving pairs (e.g. an aggressive max_df
    # dropping every posting) map_groups emits NO blocks and the result
    # would have no schema at all — union an empty typed block so
    # downstream consumers always see (id_a, id_b, jaccard)
    import ray.data as rd
    seed = rd.from_arrow(pa.table({
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64()),
        "jaccard": pa.array([], pa.float64())}))
    return seed.union(out)


def vec_column_matrix(col) -> np.ndarray:
    """Arrow list/tensor column -> (n, d) float64 matrix (zero-copy from
    the flattened list buffer where the layout allows)."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    mats = []
    for c in chunks:
        if len(c) == 0:
            continue
        if hasattr(c, "flatten"):                      # list<float>
            # offset-aware (sliced chunks): .values would ignore the
            # ListArray slice offset and misalign rows to vectors
            flat = c.flatten().to_numpy(zero_copy_only=False)
            mats.append(flat.reshape(len(c), -1).astype(np.float64))
        else:                                          # tensor extension
            arr = c.to_numpy(zero_copy_only=False)
            if arr.dtype == object:
                arr = np.stack([np.asarray(v) for v in arr])
            mats.append(np.asarray(arr, dtype=np.float64))
    return np.vstack(mats) if mats else np.empty((0, 0))


def _unit_rows(batch: pa.Table, id_col: str, vec_col: str) -> pa.Table:
    """(id, unit-normalized vector) block; vectors flattened zero-copy."""
    ids = batch.column(id_col).to_numpy().astype(np.int64)
    mat = vec_column_matrix(batch.column(vec_col))
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    return pa.table({
        "id": pa.array(ids, pa.int64()),
        "vec": pa.array(list(mat), pa.list_(pa.float64())),
    })


def _unpack_block(t: pa.Table):
    ids = t.column("id").to_numpy()
    col = t.column("vec")
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    mat = np.vstack([c.flatten().to_numpy(zero_copy_only=False)
                     .reshape(len(c), -1) for c in chunks]) \
        if len(ids) else np.empty((0, 0))
    return ids, mat


def embedding_dup_pairs_lsh(ds, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            threshold: float = 0.93,
                            num_tables: int = 8, num_bits: int = 8,
                            num_buckets: int = 64, seed: int = 29):
    """Approximate cosine >= threshold pairs via random-hyperplane LSH
    bucketing + WITHIN-BUCKET EXACT verification — the web-scale route
    of ``embedding_dup_pairs`` (same output contract: id_a < id_b,
    cosine rounded to 6; pair recall < 1 is the documented trade).

    Plan: rows explode to ``num_tables`` (table, sign-bucket) keys with
    their unit vectors; ONE groupby on hash(table, bucket) co-locates
    each bucket (vectorized segment sweep, no per-bucket pandas call);
    each segment brute-forces its exact pairs; a second bounded groupby
    on hash(id_a, id_b) dedups pairs surfacing from several tables.
    Compute is sum(bucket^2) instead of N^2 — bucket size is bounded by
    2^num_bits spreading, raise bits for denser corpora. A pair is
    missed only if its sign bits differ in EVERY table: for cosine
    >= 0.93 (theta <= 21.6 deg) per-bit agreement is 1 - theta/pi ~
    0.88, so miss probability ~ (1 - 0.88^8)^8 ~ 2% at the defaults and
    falls fast as threshold rises."""
    rng = np.random.default_rng(seed)
    norm0 = ds.map_batches(
        lambda b: _unit_rows(b, id_col, vec_col), batch_format="pyarrow")
    weights = (1 << np.arange(num_bits)).astype(np.int64)
    planes_by_dim: dict = {}

    def _planes(dim: int) -> np.ndarray:
        # deterministic per dim: every task regenerates the same planes
        # from the fixed seed (cheaper than shipping them)
        r = np.random.default_rng(seed)
        return r.standard_normal((num_tables, num_bits, dim))

    def _explode(b: pa.Table) -> pa.Table:
        ids, mat = _unpack_block(b)
        if not len(ids):
            return pa.table({
                "_gb": pa.array([], pa.int32()),
                "table": pa.array([], pa.int32()),
                "bucket": pa.array([], pa.int64()),
                "id": pa.array([], pa.int64()),
                "vec": pa.array([], pa.list_(pa.float64()))})
        planes = planes_by_dim.setdefault(mat.shape[1], _planes(mat.shape[1]))
        out_t, out_b = [], []
        for t in range(num_tables):
            bits = (mat @ planes[t].T) > 0
            out_b.append(bits.astype(np.int64) @ weights)
            out_t.append(np.full(len(ids), t, dtype=np.int32))
        tab = np.concatenate(out_t)
        buc = np.concatenate(out_b)
        gb = (_mix_cols(tab, buc) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table({
            "_gb": pa.array(gb),
            "table": pa.array(tab),
            "bucket": pa.array(buc),
            "id": pa.array(np.tile(ids.astype(np.int64), num_tables)),
            "vec": pa.array(list(np.tile(mat, (num_tables, 1))),
                            pa.list_(pa.float64())),
        })

    def _segment_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["table", "bucket", "id"], kind="mergesort")
        tab = g["table"].to_numpy()
        buc = g["bucket"].to_numpy()
        ids = g["id"].to_numpy().astype(np.int64)
        change = np.nonzero((np.diff(tab) != 0) | (np.diff(buc) != 0))[0] + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(g)]))
        vecs = g["vec"].to_numpy()
        out_a, out_b, out_c = [], [], []
        for s, e in zip(starts[ends - starts >= 2],
                        ends[ends - starts >= 2]):
            seg_ids = ids[s:e]
            mat = np.vstack(vecs[s:e])
            sims = mat @ mat.T
            ri, ci = np.nonzero(np.triu(sims >= threshold, k=1))
            keep = seg_ids[ri] != seg_ids[ci]   # same id via dup rows
            out_a.append(np.minimum(seg_ids[ri], seg_ids[ci])[keep])
            out_b.append(np.maximum(seg_ids[ri], seg_ids[ci])[keep])
            out_c.append(np.round(sims[ri, ci], 6)[keep])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                 "id_b": pd.Series(dtype=np.int64),
                                 "cosine": pd.Series(dtype=np.float64)})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "cosine": np.concatenate(out_c)})

    cand = norm0.map_batches(_explode, batch_format="pyarrow") \
        .groupby("_gb").map_groups(_segment_pairs, batch_format="pandas")

    def _tag_pair(b: pa.Table) -> pa.Table:
        pb = _mix_cols(b.column("id_a").to_numpy(),
                       b.column("id_b").to_numpy()) % np.uint64(num_buckets)
        return b.append_column("_pb", pa.array(pb.astype(np.int32)))

    def _distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b", "cosine"]]

    return cand.map_batches(_tag_pair, batch_format="pyarrow") \
        .groupby("_pb").map_groups(_distinct, batch_format="pandas")


# Above this corpus size the exact blocked cross-join (O(N^2) compute)
# auto-routes to the hyperplane-LSH plan. Tests monkeypatch it.
EMBEDDING_EXACT_ROW_LIMIT = 1_000_000


def embedding_dup_pairs(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                        threshold: float = 0.93,
                        exact_limit: int | None = None):
    """Pairs with cosine similarity >= threshold.

    SIZE-GUARDED routing: corpora up to ``exact_limit`` rows (default
    ``EMBEDDING_EXACT_ROW_LIMIT``; row count from plan metadata) run the
    EXACT blocked distributed cross-join below; larger corpora
    auto-route to ``embedding_dup_pairs_lsh`` (hyperplane bucketing +
    within-bucket exact verify, same output contract) because exact
    all-pairs is inherently O(N^2) compute no matter how it is
    distributed.

    Exact plan: the normalized corpus is left in the OBJECT STORE as
    its Arrow blocks (``to_arrow_refs`` — nothing corpus-sized on the
    driver); a task per block pair (i <= j) fetches just those two
    blocks and emits its exact above-threshold pairs. Memory per task =
    2 blocks; total network = O(N * num_blocks), the classic exact
    all-pairs map-reduce bound.

    Pair granularity is DATA-sized, not read-parallelism-sized: the
    corpus block refs are grouped driver-side into ~32 MB super-groups
    and a task handles one GROUP pair, fetching its member blocks.
    Ray splits a read into ~num_cpus blocks regardless of size and the
    pair-task count is quadratic in the unit count — an interleaved
    A/B at 32 CPUs on a 1 MB corpus measured 2.6 s for 528 trivial
    block-pair tasks (k=32 read blocks) vs ~1.2 s with one group pair.
    Grouping the refs (instead of a coalescing repartition) adds no
    barrier stage to the plan.
    """
    import ray
    import ray.data as rd

    from ..functions.joins import estimate_size_bytes

    if exact_limit is None:
        exact_limit = EMBEDDING_EXACT_ROW_LIMIT
    if ds.count() > exact_limit:
        return embedding_dup_pairs_lsh(ds, id_col, vec_col, threshold)

    norm = ds.map_batches(
        lambda b: _unit_rows(b, id_col, vec_col), batch_format="pyarrow")
    refs = norm.to_arrow_refs()
    refs_ref = ray.put(refs)
    # 2x: _unit_rows widens float32 inputs to float64. Cap 64 groups =
    # <= 2080 pair tasks; at the 1M-row route limit x wide vectors each
    # group stays ~tens of MB, two per task.
    est = estimate_size_bytes(ds) or (32 << 20)
    g = int(np.clip(-(-2 * est // (32 << 20)), 1, min(64, len(refs)) or 1))
    groups = [a.tolist() for a in np.array_split(np.arange(len(refs)), g)]
    items = [{"bi": groups[i], "bj": groups[j]}
             for i in range(g) for j in range(i, g)]
    # explicit block count: from_items' default parallelism (~200) would
    # otherwise pad a short pair list with EMPTY untyped blocks, each a
    # wasted task + an empty-schema bundle downstream
    pair_ds = rd.from_items(items, override_num_blocks=len(items))

    def _fetch_group(blocks, idxs):
        parts = [_unpack_block(ray.get(blocks[i])) for i in idxs]
        parts = [(ids, m) for ids, m in parts if len(ids)]
        if not parts:
            return np.array([], np.int64), np.zeros((0, 1))
        return (np.concatenate([p[0] for p in parts]),
                np.vstack([p[1] for p in parts]))

    def _score(batch: pa.Table) -> pa.Table:
        blocks = ray.get(refs_ref)
        out_a, out_b, out_c = [], [], []
        for bi, bj in zip(batch.column("bi").to_pylist(),
                          batch.column("bj").to_pylist()):
            ids_a, A = _fetch_group(blocks, bi)
            ids_b, B = (ids_a, A) if bi == bj else _fetch_group(blocks, bj)
            if not len(ids_a) or not len(ids_b):
                continue
            sims = A @ B.T
            ri, ci = np.nonzero(sims >= threshold)
            a_, b_ = ids_a[ri], ids_b[ci]
            if bi == bj:
                # within-block: each unordered pair appears twice plus
                # the self-pairs — keep the upper triangle
                keep = a_ < b_
                out_a.append(a_[keep])
                out_b.append(b_[keep])
                out_c.append(np.round(sims[ri, ci][keep], 6))
            else:
                # cross-block: each unordered pair appears exactly once,
                # in arbitrary id order (block layout is NOT id-sorted)
                # — canonicalize with min/max, never filter
                out_a.append(np.minimum(a_, b_))
                out_b.append(np.maximum(a_, b_))
                out_c.append(np.round(sims[ri, ci], 6))
        if not out_a:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a), pa.int64()),
            "id_b": pa.array(np.concatenate(out_b), pa.int64()),
            "cosine": pa.array(np.concatenate(out_c)),
        })

    # whole-block batches: one group-pair per task is set by from_items'
    # override_num_blocks above; an explicit batch_size made Ray's
    # slicer emit trailing ZERO-ROW batches that bypassed the UDF as
    # untyped empty output blocks
    return pair_ds.map_batches(_score, batch_format="pyarrow",
                               batch_size=None)
