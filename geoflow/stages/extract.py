"""Deterministic HTML -> text extraction (byte-identical per url).

North-rule requirement (BASELINE.json ``input_hint``): "per-row invariant
vs the reference: byte-identical extracted text per url". The fixture
generator (geoflow.sources.pages) runs this exact function to populate the
``text`` column, so parity is checked byte-for-byte in tests and can be
re-checked on any pipeline run.

The extractor is pure Python/stdlib with pinned rules (no version-drifting
HTML libraries):

1. drop <script>...</script>, <style>...</style> and <!-- comments -->,
2. block-level tags become newlines, all other tags become spaces,
3. HTML entities are decoded (``html.unescape``, stdlib, deterministic),
4. whitespace is canonicalized per line: runs of (unicode) whitespace
   collapse to one space via ``str.split()`` (C speed — 3x faster than
   an equivalent regex pass), lines are stripped, empty lines dropped,
   lines joined by \\n.

Hot-path shape: compiled regexes (C speed) applied per row inside an
Arrow ``map_batches`` stage; the html (binary) column is projected away
immediately after extraction so wide payload bytes never reach a shuffle
(SURVEY.md section 7.4 "wide binary rows").
"""

from __future__ import annotations

import html as _html
import re

import numpy as np
import pyarrow as pa

# Tags treated as block-level (their boundaries become line breaks).
_BLOCK_TAGS = (
    "p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|table|article|section|header|"
    "footer|nav|blockquote|pre|hr|title|head|body|html|main|aside|figure|"
    "figcaption|dl|dt|dd|form|fieldset|address"
)

_RE_DROP = re.compile(
    r"<script\b[^>]*>.*?</script\s*>|<style\b[^>]*>.*?</style\s*>|<!--.*?-->",
    re.IGNORECASE | re.DOTALL,
)
_RE_BLOCK = re.compile(rf"</?(?:{_BLOCK_TAGS})\b[^>]*>", re.IGNORECASE)
_RE_TAG = re.compile(r"<[^>]*>")


def extract_text(html_bytes: bytes) -> str:
    """Extract canonical plain text from one HTML document (deterministic)."""
    raw = html_bytes.decode("utf-8", errors="replace")
    raw = _RE_DROP.sub(" ", raw)
    raw = _RE_BLOCK.sub("\n", raw)
    raw = _RE_TAG.sub(" ", raw)
    raw = _html.unescape(raw)
    lines = []
    for line in raw.split("\n"):
        parts = line.split()
        if parts:
            lines.append(" ".join(parts))
    return "\n".join(lines)


def extract_batch(batch: pa.Table, html_col: str = "html",
                  out_col: str = "extracted_text",
                  drop_html: bool = True) -> pa.Table:
    """Arrow batch transform: add extracted text, drop the binary payload.

    Use with ``ds.map_batches(extract_batch, batch_format="pyarrow")``.
    """
    htmls = batch.column(html_col)
    texts = pa.array(
        [extract_text(h) if h is not None else None
         for h in htmls.to_pylist()],
        type=pa.string(),
    )
    out = batch.append_column(out_col, texts)
    if drop_html:
        out = out.drop_columns([html_col])
    return out


def verify_extraction_batch(batch: pa.Table) -> pa.Table:
    """Per-batch invariant check: extract(html) must equal the stored text.

    Emits one row per input row with a boolean ``text_matches`` — the
    pipeline-level invariant reduce is then a cheap ``Sum``/``Count``.
    """
    htmls = batch.column("html").to_pylist()
    texts = batch.column("text").to_pylist()
    ok = np.fromiter(
        (extract_text(h) == t for h, t in zip(htmls, texts)),
        dtype=bool, count=len(htmls),
    )
    return pa.table({
        "url": batch.column("url"),
        "text_matches": pa.array(ok),
    })
