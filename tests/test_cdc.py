"""CDC chunking: slow-reference parity, shift invariance (the point of
content-defined boundaries), duplicate detection."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from geoflow.stages import cdc


def slow_chunks(text: str):
    """Independent per-char reference of the buzhash chunker."""
    if not text:
        return []
    cps = [ord(c) for c in text]
    n = len(cps)

    def tval(cp):
        a = (cp * 2654435761 + 40503) % cdc.M32
        b = (cp * 1103515245 + 12345) % cdc.M32
        return a ^ (b >> 16)

    def rot(x, r):
        r %= 32
        return ((x << r) | (x >> (32 - r))) & (cdc.M32 - 1)

    chunks, start = [], 0
    for i in range(n):
        if i >= cdc.W - 1:
            h = 0
            for j in range(i - cdc.W + 1, i + 1):
                h ^= rot(tval(cps[j]), i - j)
            if h % (1 << cdc.KBITS) == cdc.MASK:
                chunks.append(text[start:i + 1])
                start = i + 1
    if start < n:
        chunks.append(text[start:])
    return chunks


def poly(s, b, p):
    h = 0
    for c in s:
        h = (h * b + ord(c)) % p
    return h


def engine_rows(texts):
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    import pyarrow as pa
    return cdc.chunk_rows(pa.Table.from_pandas(df)).to_pandas()


def test_matches_slow_reference():
    rng = np.random.default_rng(3)
    texts = ["".join(chr(rng.integers(32, 1000)) for _ in range(
        rng.integers(0, 400))) for _ in range(30)]
    got = engine_rows(texts)
    rows = []
    for t in texts:
        for c in slow_chunks(t):
            rows.append((poly(c, cdc.B1, cdc.P1),
                         poly(c, cdc.B2, cdc.P2), len(c)))
    want = pd.DataFrame(rows, columns=["h1", "h2", "chunk_len"])
    key = ["h1", "h2", "chunk_len"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True),
        check_dtype=False)


def test_shift_invariance():
    """Insert a random prefix: chunks far enough past the insertion
    point must be identical — the CDC property fixed-size chunking
    lacks."""
    rng = np.random.default_rng(9)
    body = "".join(chr(rng.integers(97, 123)) for _ in range(3000))
    a = slow_chunks(body)
    b = slow_chunks("PREFIX-" + body)
    # all but the first few chunks realign exactly
    assert a[-5:] == b[-5:]
    tail_a = set(a[2:])
    tail_b = set(b[2:])
    assert len(tail_a & tail_b) >= len(tail_a) - 2


def test_duplicate_detection():
    rng = np.random.default_rng(11)
    shared = "".join(chr(rng.integers(97, 123)) for _ in range(600))
    texts = ["AAA" + shared + "BBB", "CCCCCC" + shared + "DD",
             shared, "unrelated text entirely " * 10]
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": range(4), "text": texts})).repartition(2)
    dup = cdc.cdc_dup_chunks(ds).to_pandas()
    assert len(dup) >= 3           # shared run yields shared chunks
    assert (dup["n_copies"] >= 2).all()
    assert (dup["n_copies"] <= 3).max()   # the 3-way shared chunks
    assert dup["n_copies"].max() == 3


def test_empty_and_short():
    got = engine_rows(["", None, "short", "x" * 15])
    # sub-window docs form one chunk each
    assert len(got) == 2
    assert set(got["chunk_len"]) == {5, 15}
