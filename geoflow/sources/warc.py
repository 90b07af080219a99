"""WARC/1.0 web-archive source: from-scratch reader + writer.

The wire format of web-scale text corpora (Common Crawl et al.),
implemented directly from the public ISO 28500 / WARC 1.0 layout —
no external libraries:

    WARC/1.0\r\n
    <header-name>: <value>\r\n ...          (headers)
    \r\n
    <Content-Length payload bytes>
    \r\n\r\n                                 (record boundary)

Both storage variants are supported: plain ``.warc`` and the
Common-Crawl-style ``.warc.gz`` of CONCATENATED per-record gzip
members (each record its own member, so byte-range access to a single
record needs no other record — the property crawl indexes rely on).

Scale shape: ``read_warc`` is ``ray.data.read_binary_files`` (one
task per archive file — crawls shard into ~1 GB archives by
construction) followed by a stateless per-file record parse emitting
(url, warc_ts, payload) rows; nothing is centralized. Finer-than-file
parallelism at 100 TB comes from the per-member gzip property: a
(file, offset) index dataset + ranged reads — the layout supports it
by construction, the sandbox never needs it.

Reference anchor: none (the reference reads rasters); this is the
web-corpus half of the source layer, feeding the same pages schema
as sources.pages.
"""

from __future__ import annotations

import gzip
import io
import zlib

import numpy as np
import pyarrow as pa

_CRLF = b"\r\n"


def write_warc(path: str, records: list[dict], compress: bool = False
               ) -> None:
    """Write (url, warc_ts, payload: bytes) records as WARC/1.0
    response records — one gzip member per record when ``compress``."""
    out = io.BytesIO()
    for i, r in enumerate(records):
        payload = r["payload"]
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Record-ID: <urn:uuid:{i:032x}>\r\n".encode()
            + f"WARC-Target-URI: {r['url']}\r\n".encode()
            + f"WARC-Date: {r['warc_ts']}\r\n".encode()
            + f"Content-Length: {len(payload)}\r\n".encode()
            + _CRLF)
        rec = head + payload + _CRLF + _CRLF
        if compress:
            out.write(gzip.compress(rec, mtime=0))
        else:
            out.write(rec)
    with open(path, "wb") as f:
        f.write(out.getvalue())


def _gunzip_members(data: bytes) -> bytes:
    """Decompress CONCATENATED gzip members (each record its own)."""
    out, pos = [], 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data[pos:]))
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("corrupt gzip member stream")
        pos += consumed
    return b"".join(out)


def parse_warc(data: bytes) -> list[dict]:
    """Parse one archive's bytes into (url, warc_ts, payload) dicts.
    Content-Length is authoritative for the payload span (payloads may
    contain anything, including 'WARC/1.0')."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    recs, pos = [], 0
    while True:
        start = data.find(b"WARC/1.0\r\n", pos)
        if start < 0:
            break
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            raise ValueError("truncated WARC header")
        headers = {}
        for line in data[start + 10:hdr_end].split(_CRLF):
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        n = int(headers[b"content-length"])
        body = data[hdr_end + 4:hdr_end + 4 + n]
        if len(body) != n:
            raise ValueError("truncated WARC payload")
        recs.append({
            "url": headers.get(b"warc-target-uri", b"").decode(),
            "warc_ts": headers.get(b"warc-date", b"").decode(),
            "payload": body,
        })
        pos = hdr_end + 4 + n
    return recs


def read_warc(paths):
    """Dataset of (url, warc_ts, payload) rows from WARC archives —
    one parse task per archive file, records exploded per batch."""
    import ray.data as rd

    files = rd.read_binary_files(paths)

    def _explode(b: pa.Table) -> pa.Table:
        urls, tss, payloads = [], [], []
        for blob in b.column("bytes").to_pylist():
            for r in parse_warc(blob):
                urls.append(r["url"])
                tss.append(r["warc_ts"])
                payloads.append(r["payload"])
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        })

    return files.map_batches(_explode, batch_format="pyarrow")
