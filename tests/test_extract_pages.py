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


# --- scalar vs Arrow-vectorized parity -----------------------------------

def test_vectorized_extractor_parity_generator():
    import pyarrow as pa

    from geoflow.sources.pages import render_html
    from geoflow.stages.extract import extract_text, extract_texts_arrow

    htmls = [render_html(i, i * 31 + 7) for i in range(200)]
    vec = extract_texts_arrow(pa.array(htmls, pa.binary())).to_pylist()
    assert vec == [extract_text(h) for h in htmls]


def test_vectorized_extractor_parity_adversarial():
    import pyarrow as pa

    from geoflow.stages.extract import extract_text, extract_texts_arrow

    cases = [
        b"",
        b"plain text no tags",
        b"<p>a</p><p>b</p>",
        b"<script>while(1){if(a<b)x();}</script>after",
        b"<SCRIPT TYPE='x'>nested <b>tag</b></script >tail",
        b"<style a>b{c:d}</style\t>x",
        b"<!-- c1 --><!-- <p>not a para</p> -->y",
        b"<scripty>not script</scripty>ok",   # tag-name boundary
        b"<pre>kept as block</pre>",
        b"<px>inline unknown</px>",
        b"a &amp; b &lt;c&gt; &#8212; &copy; &nbsp; &unknown; d",
        b"&#10;entity newline",
        "unicode    spaces and lines".encode(),
        b"   \t \n\n  mixed \r\n ws \x0b x \x1c y  \n ",
        b"<div>a<br>b</div><ul><li>i1</li><li>i2</li></ul>",
        b"<script>no closer",
        b"< not a tag",
        b"<p attr='>'>odd quote</p>",
        b"\xff\xfe invalid utf8 <p>x</p>",    # decode errors=replace
        "résumé <p>café</p>".encode(),
    ]
    vec = extract_texts_arrow(pa.array(cases, pa.binary())).to_pylist()
    ref = [extract_text(h) for h in cases]
    for c, v, r in zip(cases, vec, ref):
        assert v == r, (c, v, r)


def test_vectorized_extractor_parity_property():
    import pyarrow as pa
    from hypothesis import given, settings, strategies as st

    from geoflow.stages.extract import extract_text, extract_texts_arrow

    frag = st.sampled_from([
        "<p>", "</p>", "<div>", "</div>", "<script>", "</script>",
        "</script >", "<style>", "</style>", "<!--", "-->", "<br>",
        "<li>", "</li>", "<span>", "</span>", "<x y='z'>", "&amp;",
        "&lt;", "&#65;", "&#10;", "&nbsp;", "&bogus;", "word", "two w",
        " ", "\t", "\n", " ", " ", " ", "<", ">", "&",
        "café", "<scripta>", "</pre>", "<pre>",
    ])
    docs = st.lists(st.lists(frag, max_size=30).map("".join), max_size=8)

    @settings(max_examples=150, deadline=None)
    @given(docs)
    def run(texts):
        raw = [t.encode("utf-8") for t in texts]
        vec = extract_texts_arrow(pa.array(raw, pa.binary())).to_pylist()
        assert vec == [extract_text(h) for h in raw]

    run()


def test_enrich_extractor_flag_routes_identically():
    """enrich_pages_batch(extractor=...) must yield identical tables on
    both routes, including null html rows (arrow fills nulls with ""
    to match the scalar `h is None` branch)."""
    from geoflow.pipelines.flagship import enrich_pages_batch

    batch = pages.make_pages_batch({"id": np.arange(64, dtype=np.int64)})
    cols = {c: batch.column(c) for c in batch.column_names}
    html = cols["html"].to_pylist()
    html[5] = None
    cols["html"] = pa.array(html, pa.binary())
    t = pa.table(cols)
    a = enrich_pages_batch(t, verify=False, extractor="arrow")
    s = enrich_pages_batch(t, verify=False, extractor="scalar")
    assert a.equals(s)
    assert a.column("n_chars").to_pylist()[5] == 0
