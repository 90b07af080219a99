"""WARC source: round-trips (plain + per-record gzip members),
adversarial payloads, distributed read."""

import numpy as np
import pytest

from geoflow.sources.warc import parse_warc, read_warc, write_warc


def _recs(n=25):
    out = []
    for i in range(n):
        # adversarial payloads: empty, binary, CRLFs, fake WARC header
        body = [b"", b"\x00\xff" * 40, b"line\r\n\r\nline",
                b"WARC/1.0\r\nnot a record", f"doc {i}".encode()][i % 5]
        out.append({"url": f"https://x.example/p{i}",
                    "warc_ts": f"2026-08-{(i % 27) + 1:02d}T00:00:00Z",
                    "payload": body})
    return out


@pytest.mark.parametrize("compress", [False, True])
def test_warc_roundtrip(tmp_path, compress):
    recs = _recs()
    p = str(tmp_path / ("a.warc.gz" if compress else "a.warc"))
    write_warc(p, recs, compress=compress)
    got = parse_warc(open(p, "rb").read())
    assert got == recs


def test_read_warc_distributed(ray_session, tmp_path):
    recs = _recs(40)
    write_warc(str(tmp_path / "a.warc"), recs[:20])
    write_warc(str(tmp_path / "b.warc.gz"), recs[20:], compress=True)
    df = read_warc([str(tmp_path / "a.warc"),
                    str(tmp_path / "b.warc.gz")]).to_pandas()
    assert len(df) == 40
    by_url = {r["url"]: r for r in recs}
    for _, row in df.iterrows():
        want = by_url[row.url]
        assert bytes(row.payload) == want["payload"]
        assert row.warc_ts == want["warc_ts"]
