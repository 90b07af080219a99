"""JSONL (newline-delimited JSON) source: ranged reader + writer.

The interchange format of web-text corpus dumps (one JSON object per
line). The property that makes it web-scale friendly is the same one
the reader exploits: ANY byte offset can resynchronize at the next
newline, so a file splits into independent ranges with no index —
unlike block-compressed formats, no task ever needs another task's
bytes.

Scale shape: ``read_jsonl`` plans fixed-size byte ranges over the
input files (a small driver-side listing of (path, start, end) —
O(files x ranges) rows, never data), then each range is read, cut at
line boundaries (first newline after ``start`` .. first newline after
``end``, so every line belongs to exactly one range), and parsed with
pyarrow's C++ NDJSON parser — vectorized, no per-row Python. A 100 TB
corpus in 1 GB shards becomes ~1.6 M independent 64 MB range tasks.

Reference anchor: none (the reference reads rasters); this is the
interchange half of the web source layer next to sources/warc.py.
"""

from __future__ import annotations

import io
import json
import os

import pyarrow as pa
import pyarrow.json as pa_json


def write_jsonl(path: str, rows: list[dict]) -> None:
    """One JSON object per line, '\\n'-terminated, UTF-8."""
    with open(path, "wb") as f:
        for r in rows:
            f.write(json.dumps(r, ensure_ascii=False,
                               separators=(",", ":")).encode("utf-8"))
            f.write(b"\n")


def _plan_ranges(paths: list[str], range_bytes: int
                 ) -> list[dict]:
    ranges = []
    for p in paths:
        size = os.path.getsize(p)
        start = 0
        while start < size:
            ranges.append({"path": p, "start": start,
                           "end": min(start + range_bytes, size)})
            start += range_bytes
        if size == 0:
            ranges.append({"path": p, "start": 0, "end": 0})
    return ranges


def read_range_lines(path: str, start: int, end: int) -> bytes:
    """The complete lines owned by byte range [start, end): a line
    belongs to the range containing its FIRST byte. Reads at most
    (end - start) + one overshoot line."""
    with open(path, "rb") as f:
        if start > 0:
            f.seek(start - 1)
            prev = f.read(1)
            # if the previous byte is not a newline, this range starts
            # mid-line; that line belongs to the previous range
            buf = f.read(end - start)
            if prev != b"\n":
                cut = buf.find(b"\n")
                if cut < 0:
                    return b""
                buf = buf[cut + 1:]
        else:
            buf = f.read(end - start)
        # extend to finish the last (possibly cut) line
        if buf and not buf.endswith(b"\n"):
            while True:
                more = f.read(1 << 16)
                if not more:
                    break
                cut = more.find(b"\n")
                if cut >= 0:
                    buf += more[:cut + 1]
                    break
                buf += more
    return buf


def read_jsonl(paths: list[str], columns: list[str] | None = None,
               range_bytes: int = 64 << 20):
    """Dataset over JSONL files: one parse task per byte range.

    ``columns`` projects after the C++ parse (NDJSON carries no column
    layout, so unlike parquet the prune saves inter-stage bytes, not
    I/O bytes)."""
    import ray.data as rd

    ranges = _plan_ranges(list(paths), range_bytes)
    plan = rd.from_items(ranges, override_num_blocks=max(1, len(ranges)))

    def _parse(b: pa.Table) -> pa.Table:
        tables = []
        for path, start, end in zip(b.column("path").to_pylist(),
                                    b.column("start").to_pylist(),
                                    b.column("end").to_pylist()):
            buf = read_range_lines(path, start, end)
            if not buf.strip():
                continue
            t = pa_json.read_json(io.BytesIO(buf))
            tables.append(t.select(columns) if columns else t)
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables, promote_options="default")

    return plan.map_batches(_parse, batch_format="pyarrow")
