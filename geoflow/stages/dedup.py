"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Training-data-pipeline operators (task brief "Deduplication"). Shapes:

- exact: content hash -> hash-partitioned groupby, first-wins
  (geoflow.pipelines.flagship.dedup_exact).
- MinHash+LSH: per-batch signatures (vectorized universal hashing over
  word-shingle hashes) -> explode to (band_id, band_hash, doc_id) rows
  -> groupby band bucket -> candidate pairs -> verify with exact
  Jaccard. The shuffle moves only the tiny band rows, never the text.
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

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = (1 << 61) - 1


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
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(object)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(object)
    return a, b


def minhash_signature(shingles: np.ndarray, a, b, num_perm: int) -> np.ndarray:
    """min over shingles of (a*h + b) mod p, per permutation (vectorized)."""
    if len(shingles) == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    h = shingles.astype(object)[None, :]          # python ints: exact mod-p
    vals = (a[:, None] * h + b[:, None]) % _MERSENNE
    return np.array([int(min(row)) for row in vals], dtype=np.uint64)


def minhash_batch(batch: pa.Table, id_col: str, text_col: str = "text",
                  num_perm: int = 64, shingle_k: int = 3) -> pa.Table:
    """ids + minhash signatures per row (signature as fixed-len list)."""
    a, b = _perm_params(num_perm)
    ids = batch.column(id_col)
    sigs = [
        minhash_signature(_shingle_hashes(t, shingle_k), a, b, num_perm)
        for t in batch.column(text_col).to_pylist()
    ]
    return pa.table({
        id_col: ids,
        "sig": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
    })


def explode_bands(batch: pa.Table, id_col: str, num_bands: int = 16) -> pa.Table:
    """signature rows -> (band_id, band_hash, id) rows for the LSH shuffle."""
    ids = batch.column(id_col).to_numpy()
    sig_col = batch.column("sig")
    chunks = sig_col.chunks if isinstance(sig_col, pa.ChunkedArray) else [sig_col]
    flat = np.concatenate(
        [c.values.to_numpy(zero_copy_only=False) for c in chunks])
    num_perm = len(flat) // max(len(ids), 1) if len(ids) else 0
    rows_per_band = num_perm // num_bands
    sig = flat.reshape(len(ids), num_perm)
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


def minhash_lsh_pairs(ds, id_col: str, text_col: str = "text",
                      num_perm: int = 64, num_bands: int = 16,
                      jaccard_threshold: float = 0.5,
                      texts_ref=None):
    """Full MinHash-LSH near-dup pipeline -> verified pairs Dataset.

    ``texts_ref``: optional ``ray.put`` handle of an {id: text} dict used
    by the verify stage (small-side broadcast). When None, verification
    uses the signature estimate only.
    """
    import ray

    sigs = ds.map_batches(
        lambda b: minhash_batch(b, id_col, text_col, num_perm),
        batch_format="pyarrow")
    sigs_mat = sigs.materialize()  # reused: band explode + verify lookups
    bands = sigs_mat.map_batches(
        lambda b: explode_bands(b, id_col, num_bands), batch_format="pyarrow")
    cands = bands.groupby(["band_id", "band_hash"]).map_groups(
        candidate_pairs_from_buckets(id_col), batch_format="pandas")
    # distinct pairs (a bucket collision in several bands repeats a pair)
    cands = cands.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")

    sig_lookup = {int(r[id_col]): np.asarray(r["sig"], dtype=np.uint64)
                  for r in sigs_mat.iter_rows()}
    sig_ref = ray.put(sig_lookup)
    texts = texts_ref

    def _verify(batch: pd.DataFrame) -> pd.DataFrame:
        sl = ray.get(sig_ref)
        tl = ray.get(texts) if texts is not None else None
        est, jac = [], []
        for a_, b_ in zip(batch["id_a"], batch["id_b"]):
            sa, sb = sl[int(a_)], sl[int(b_)]
            est.append(float(np.mean(sa == sb)))
            if tl is not None:
                A = set(_shingle_hashes(tl[int(a_)]).tolist())
                B = set(_shingle_hashes(tl[int(b_)]).tolist())
                jac.append(len(A & B) / max(len(A | B), 1))
            else:
                jac.append(est[-1])
        batch = batch.copy()
        batch["jaccard_est"] = est
        batch["jaccard"] = jac
        return batch[batch["jaccard"] >= jaccard_threshold]

    return cands.map_batches(_verify, batch_format="pandas")


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


def dup_components(pairs_ds, max_iters: int = 10):
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
        labels = candidates.groupby("id").aggregate(
            Min("label", alias_name="label")).materialize()
    return labels.map_batches(
        lambda b: pa.table({"doc_id": b.column("id"),
                            "component": b.column("label")}),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_batch(batch: pa.Table, id_col: str, text_col: str = "text") -> pa.Table:
    """64-bit SimHash per row over token hashes (sign of weighted bit sums)."""
    ids = batch.column(id_col)
    out = np.empty(len(ids), dtype=np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(batch.column(text_col).to_pylist()):
        toks = (t or "").split()
        if not toks:
            out[i] = 0
            continue
        hs = np.fromiter(
            (int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(),
                            "big") for w in toks),
            dtype=np.uint64, count=len(toks))
        bitmat = ((hs[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64)
        sums = (2 * bitmat - 1).sum(axis=0)
        out[i] = np.uint64(((sums > 0).astype(np.uint64) << bits).sum())
    return pa.table({id_col: ids, "simhash": pa.array(out, pa.uint64())})


def simhash_pairs(ds, id_col: str, text_col: str = "text",
                  max_hamming: int = 3):
    """Near-dup pairs with Hamming distance <= max_hamming (<=15 supported
    by the 4x16-bit pigeonhole banding)."""
    sigs = ds.map_batches(
        lambda b: simhash_batch(b, id_col, text_col), batch_format="pyarrow")

    def _bands(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        sh = batch.column("simhash").to_numpy()
        parts = []
        for band in range(4):
            chunk = (sh >> np.uint64(16 * band)) & np.uint64(0xFFFF)
            parts.append(pa.table({
                id_col: pa.array(ids),
                "simhash": pa.array(sh, pa.uint64()),
                "band_id": pa.array(np.full(len(ids), band, dtype=np.int32)),
                "band_hash": pa.array(chunk, pa.uint64()),
            }))
        return pa.concat_tables(parts)

    bands = sigs.map_batches(_bands, batch_format="pyarrow")

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col).sort_values(id_col)
        ids = g[id_col].to_numpy()
        sh = g["simhash"].to_numpy().astype(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                 "id_b": pd.Series(dtype=np.int64),
                                 "hamming": pd.Series(dtype=np.int64)})
        ia, ib = np.triu_indices(len(ids), k=1)
        x = sh[ia] ^ sh[ib]
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x = x >> np.uint64(1)
        keep = ham <= max_hamming
        return pd.DataFrame({"id_a": ids[ia][keep], "id_b": ids[ib][keep],
                             "hamming": ham[keep]})

    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        _pairs, batch_format="pandas")
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup / n-gram Jaccard
# ---------------------------------------------------------------------------

def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact word-k-shingle Jaccard between two texts."""
    A = set(_shingle_hashes(a, k).tolist())
    B = set(_shingle_hashes(b, k).tolist())
    return len(A & B) / max(len(A | B), 1)


def embedding_dup_pairs(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                        threshold: float = 0.93):
    """Pairs with cosine similarity >= threshold.

    Small-side broadcast: the unit-normalized corpus matrix goes into the
    object store once (``ray.put``); each batch does one blocked matmul
    against it. O(N*B) flops per batch — the scale path swaps the
    broadcast matrix for LSH bucketing (random hyperplanes), same
    pair-emission contract.
    """
    import ray

    rows = ds.select_columns([id_col, vec_col]).to_pandas()
    ids_all = rows[id_col].to_numpy()
    mat = np.vstack(rows[vec_col].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids_all, mat))

    def _pairs(batch: pa.Table) -> pa.Table:
        ids_a, corpus = ray.get(ref)
        ids = batch.column(id_col).to_numpy()
        vecs = np.vstack(
            [np.asarray(v, dtype=np.float64)
             for v in batch.column(vec_col).to_pylist()])
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        sims = vecs @ corpus.T
        ri, ci = np.nonzero(sims >= threshold)
        a_ = ids[ri]
        b_ = ids_a[ci]
        keep = a_ < b_   # canonical orientation also drops self-pairs
        return pa.table({
            "id_a": pa.array(a_[keep], pa.int64()),
            "id_b": pa.array(b_[keep], pa.int64()),
            "cosine": pa.array(np.round(sims[ri, ci][keep], 6)),
        })

    return ds.map_batches(_pairs, batch_format="pyarrow")
