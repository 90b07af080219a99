import numpy as np
import pyarrow as pa

from geoflow.sources import pages
from geoflow.stages.extract import extract_batch, extract_text


def test_extract_basic_rules():
    html = (b"<html><head><title>T &amp; U</title>"
            b"<style>p {color: red}</style>"
            b"<script>var x = '<p>not text</p>';</script></head>"
            b"<body><h1>Head</h1><!-- hidden --><p>one  two\tthree</p>"
            b"<div><span>inline</span> <em>join</em></div></body></html>")
    out = extract_text(html)
    assert out == "T & U\nHead\none two three\ninline join"
    assert "not text" not in out
    assert "hidden" not in out


def test_extract_deterministic_and_entities():
    h = b"<p>&lt;tag&gt; &#8212; &quot;q&quot;</p>"
    assert extract_text(h) == extract_text(h) == '<tag> — "q"'


def test_generator_text_matches_extractor():
    batch = pages.make_pages_batch({"id": np.arange(200, dtype=np.int64)})
    htmls = batch.column("html").to_pylist()
    texts = batch.column("text").to_pylist()
    for h, t in zip(htmls, texts):
        assert extract_text(h) == t  # byte-identical invariant
    assert batch.schema.field("warc_ts").type == pa.timestamp("us")
    assert batch.schema.field("html").type == pa.binary()


def test_generator_has_duplicates_and_langs():
    batch = pages.make_pages_batch({"id": np.arange(2000, dtype=np.int64)})
    texts = batch.column("text").to_pylist()
    assert len(set(texts)) < len(texts)  # dup fraction > 0
    langs = set(batch.column("lang").to_pylist())
    assert langs <= {"en", "de", "fr", "es", "ru", "zh"}
    assert len(langs) >= 3


def test_extract_batch_drops_html():
    batch = pages.make_pages_batch({"id": np.arange(10, dtype=np.int64)})
    out = extract_batch(batch)
    assert "html" not in out.column_names
    assert out.column("extracted_text").to_pylist() == batch.column("text").to_pylist()


def test_pages_dataset_streams(ray_session):
    ds = pages.pages_dataset(500, override_num_blocks=4)
    assert ds.count() == 500
    sample = ds.take(3)
    assert {"url", "warc_ts", "html", "text", "lang"} <= set(sample[0].keys())


def test_pages_from_documents(sf_small):
    ds = pages.pages_from_documents(sf_small)
    row = ds.take(1)[0]
    assert row["url"].startswith("https://site")
    assert extract_text(row["html"]) == row["text"]
