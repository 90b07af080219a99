"""JSONL source: byte-range resync invariants + distributed read."""

import json
import os

import numpy as np
import pytest

from geoflow.sources.jsonl import (_plan_ranges, read_jsonl,
                                   read_range_lines, write_jsonl)


@pytest.fixture()
def corpus(tmp_path):
    rows = [{"doc_id": i,
             "lang": ["en", "de", "fr"][i % 3],
             "text": ("héllo wörld " * (i % 7)) + f"doc {i} 終"}
            for i in range(200)]
    p = str(tmp_path / "docs.jsonl")
    write_jsonl(p, rows)
    return p, rows


def test_range_partition_covers_each_line_once(corpus):
    """Every line belongs to exactly ONE range — for ANY range size,
    concatenating per-range lines reproduces the file byte-for-byte."""
    p, _ = corpus
    size = os.path.getsize(p)
    whole = open(p, "rb").read()
    for rb in [1, 7, 64, 1000, size, size + 10]:
        got = b"".join(
            read_range_lines(r["path"], r["start"], r["end"])
            for r in _plan_ranges([p], rb))
        assert got == whole, f"range_bytes={rb}"


def test_range_midline_and_tiny_ranges(corpus):
    """Ranges of 1 byte: most ranges own no line; the owners are
    exactly the ranges starting at a line's first byte."""
    p, rows = corpus
    parsed = []
    for r in _plan_ranges([p], 1):
        buf = read_range_lines(r["path"], r["start"], r["end"])
        if buf:
            parsed.extend(json.loads(ln) for ln in
                          buf.decode().splitlines())
    assert parsed == rows


def test_empty_file(tmp_path, ray_session):
    p = str(tmp_path / "empty.jsonl")
    write_jsonl(p, [])
    assert read_jsonl([p]).count() == 0


def test_read_jsonl_distributed_roundtrip(corpus, ray_session):
    p, rows = corpus
    # tiny ranges force every resync path through the executor
    out = read_jsonl([p], columns=["doc_id", "text"],
                     range_bytes=256).to_pandas()
    assert len(out) == len(rows)
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [r["doc_id"] for r in rows]
    assert out["text"].tolist() == [r["text"] for r in rows]
    assert list(out.columns) == ["doc_id", "text"]
