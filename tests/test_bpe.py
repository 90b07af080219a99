"""BPE tokenizer training: canonical-scan parity, driver/distributed
path equality, encode round-trip, and the DuckDB oracle replay."""

from collections import Counter

import duckdb
import pytest
import ray.data as rd

from geoflow.stages.bpe import (
    _pad, _pair_counter, apply_merge, _best_pair,
    encode_word, encode_bpe, train_bpe,
)

CORPUS = [
    "low lower lowest low low newest newer new wide wider widest",
    "new new newer newest low slow slowest slower wide wide",
    "widest slowest lowest newest low low new wide",
]


def _canonical_bpe(word_freq: dict[str, int], rounds: int):
    """Sennrich et al.'s reference algorithm: symbol tuples, explicit
    left-to-right greedy merge scan."""
    vocab = {tuple(w): f for w, f in word_freq.items()}
    merges = []
    for r in range(1, rounds + 1):
        pair_n: Counter = Counter()
        for sym, f in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pair_n[a + " " + b] += f
        if not pair_n:
            break
        pair, n = min(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, pair, n))
        left, right = pair.split(" ")
        new = {}
        for sym, f in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if (i + 1 < len(sym) and sym[i] == left
                        and sym[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + f
        vocab = new
    return merges


def test_fixpoint_equals_canonical_scan():
    wf = Counter(w for t in CORPUS for w in t.split())
    strings = [_pad(w) for w in wf]
    freqs = list(wf.values())
    ours = []
    for r in range(1, 13):
        best = _best_pair(_pair_counter(strings, freqs))
        if best is None:
            break
        ours.append((r, best[0], best[1]))
        strings = [apply_merge(s, best[0]) for s in strings]
    assert ours == _canonical_bpe(wf, 12)


def test_conflict_chain_needs_multiple_passes():
    # " a b a b a b " resolves one link per replace pass; the fixpoint
    # must still equal the canonical left-to-right scan
    assert apply_merge(" a b a b a b ", "a b") == " ab ab ab "


def test_driver_and_distributed_paths_identical(ray_session):
    ds = rd.from_items([{"text": t} for t in CORPUS])
    local = train_bpe(ds, num_merges=8)
    dist = train_bpe(rd.from_items([{"text": t} for t in CORPUS]),
                     num_merges=8, driver_limit=0)
    assert local.equals(dist)
    assert local.column_names == ["merge_rank", "pair", "n"]
    assert local.num_rows == 8


def test_encode_roundtrip_and_memo(ray_session):
    ds = rd.from_items([{"text": t} for t in CORPUS])
    merges = train_bpe(ds, num_merges=8).column("pair").to_pylist()
    for w in ("lowest", "slower", "widest", "x"):
        pieces = encode_word(w, merges)
        assert "".join(pieces) == w
    docs = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(CORPUS)])
    enc = encode_bpe(docs, merges, concurrency=1).to_pandas()
    # every doc encoded, positions 1..k contiguous per doc
    for i, t in enumerate(CORPUS):
        sub = enc[enc.doc_id == i]
        assert list(sub.pos) == list(range(1, len(sub) + 1))
        assert "".join(sub.piece) == t.replace(" ", "")


def test_train_bpe_survives_empty_shuffle_blocks(ray_session):
    # Ray's sort shuffle emits one output block per input block, so a
    # tiny corpus spread over many blocks yields zero-row blocks with an
    # EMPTY schema after word_types' groupby — the exact shape that
    # crashed bpe_merges in the round-3 driver run (KeyError 'Field "s"').
    ds = rd.from_items([{"text": t} for t in CORPUS]).repartition(64)
    ref = train_bpe(rd.from_items([{"text": t} for t in CORPUS]),
                    num_merges=8)
    got = train_bpe(ds, num_merges=8)
    assert got.equals(ref)
    # distributed merge path over the same fragmented layout
    dist = train_bpe(
        rd.from_items([{"text": t} for t in CORPUS]).repartition(64),
        num_merges=8, driver_limit=0)
    assert dist.equals(ref)


def test_nonempty_block_helpers(ray_session):
    import pyarrow as pa

    from geoflow.functions.agg import (nonempty_arrow_blocks,
                                       nonempty_batches, skip_empty)

    # groupby over heavily over-partitioned tiny data produces zero-row
    # (often empty-schema) blocks; the helpers must drop them
    from ray.data.aggregate import Sum
    ds = (rd.from_items([{"k": i % 2, "v": i} for i in range(6)])
          .repartition(32).groupby("k").aggregate(Sum("v", alias_name="s")))
    blocks = nonempty_arrow_blocks(ds)
    assert all(b.num_rows > 0 for b in blocks)
    assert sum(b.num_rows for b in blocks) == 2
    assert sum(b.num_rows for b in nonempty_batches(ds)) == 2

    # skip_empty: empty-schema input short-circuits to the typed table
    schema = pa.schema([("x", pa.int64())])
    fn = skip_empty(lambda b: pa.table({"x": b.column("k")}), schema)
    out = fn(pa.table({}))
    assert out.schema == schema and out.num_rows == 0
    assert fn(pa.table({"k": [1, 2]})).num_rows == 2


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001"])
def test_bpe_oracle_replay(ray_session, sf):
    from geoflow.pipelines.queries import QUERIES, _bpe_sql

    got = QUERIES["bpe_merges"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(_bpe_sql()).fetchdf()
    assert got.merge_rank.tolist() == want.merge_rank.tolist()
    assert got.pair.tolist() == want.pair.tolist()
    assert got.n.tolist() == want.n.tolist()
