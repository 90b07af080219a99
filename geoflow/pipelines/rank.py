"""Multi-criteria ranking of corrections (reference entry point #5).

Engine shape (SURVEY.md section 3.2): a single terrain + fit pass feeds
ONE wide ``map_batches`` that applies every correction (adding one
column per correction per tile row — the reference spawns a process per
correction and round-trips GeoTIFFs, ``multi_criteria_rank.py:199-239``),
then per-band metric groups compute all 7 metrics for the original and
every correction in one task, and the tiny (corrections x bands) table
is normalized/weighted/ranked on the driver.

Normalization semantics transcribed from ``multi_criteria_rank.py:169-197``:
- reductions combine with sign flip (metrics.py:64,77-78);
  relative_median_difference combines as -abs(corrected - original)
  (metrics.py:139-140); the combine is applied to the ``__orig__`` row too;
- QUIRK preserved: ``_normalize`` compares the COMBINED (sign-flipped)
  values against the PRE-combine original metrics (``merge`` captures
  ``orig_metrics`` before mutating the frame, :170-174) — so for the
  reduction metrics "better than original" (-x > +orig) is unreachable
  and nearly every entry lands on the "worse" branch
  (x - min)/(orig_raw - min) - 1, which is still monotone in x.
  Faithfully reproduced, not fixed;
- equal (possible when both are 0, e.g. outlier counts) -> 0; the
  original row is dropped; weighted sum across metrics (NaN-skipping,
  like pandas .sum(1)); combined across bands (default sum,
  BandMetricsCombiner, :52-90); sorted descending.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..context import CorrectionContext, DEFAULT_CONTEXT
from ..oracle import kernels as ok
from ..stages.corrections import fit_corrections
from ..stages.metrics import (METRIC_IDS, ORIG_KEY,
                              evaluate_corrections_ds, metric_ids)
from ..stages.terrain import _rows_as_arrays
from .correction import prepare_terrain

# column-safe names for the wide layout
def _col(name: str) -> str:
    return "corr_" + name.replace(" ", "_").replace("+", "p").replace("-", "_")


def apply_all_wide_batch(batch: pa.Table, fns: list,
                         coeffs_by_raster: dict,
                         ctx: CorrectionContext) -> pa.Table:
    """``fns``: [(name, correction_fn)] resolved from the registry ON THE
    DRIVER so user-registered corrections reach worker processes."""
    rid = batch.column("raster_id").to_pylist()
    band = batch.column("band").to_numpy()
    pixels = _rows_as_arrays(batch.column("pixels"))
    lums = _rows_as_arrays(batch.column("luminance"))
    slopes = _rows_as_arrays(batch.column("slope"))
    keep_cols = ["band", "tile_y", "tile_x", "pixels", "luminance"]
    if "zone_ids" in batch.column_names:
        keep_cols.append("zone_ids")
    keep = batch.select(keep_cols)
    for name, fn in fns:
        outs = []
        for r, b, I, L, s in zip(rid, band, pixels, lums, slopes):
            res = np.asarray(fn(I, L, s, coeffs_by_raster[r], int(b), ctx),
                             dtype=np.float32)
            outs.append(res.ravel())
        keep = keep.append_column(_col(name),
                                  pa.array(outs, pa.list_(pa.float32())))
    return keep


def compute_metrics_table(tiles_ds, names: list[str] | None = None,
                          ctx: CorrectionContext = DEFAULT_CONTEXT) -> pd.DataFrame:
    """-> DataFrame indexed (correction, band) with the 7 metric columns."""
    from ..registry import CORRECTIONS

    names = names or list(ok.CORRECTION_NAMES)
    fns = [(n, CORRECTIONS[n]) for n in names]   # driver-side resolve
    terrain = prepare_terrain(tiles_ds, ctx)
    coeffs = fit_corrections(terrain, ctx)
    wide = terrain.map_batches(
        lambda b: apply_all_wide_batch(b, fns, coeffs, ctx),
        batch_format="pyarrow")
    mt = evaluate_corrections_ds(wide, [_col(n) for n in names]).to_pandas()
    inv = {_col(n): n for n in names}
    mt["correction"] = mt["correction"].map(lambda c: inv.get(c, c))
    return mt.set_index(["correction", "band"]).sort_index()


def combine_vs_original(metrics: pd.DataFrame) -> pd.DataFrame:
    """Sign-flip reductions; median becomes -abs(corrected - original).
    Applied to every row including ``__orig__`` (multi_criteria_rank.py
    :171-173 mutates the whole column)."""
    from ..registry import METRICS

    orig_raw = metrics.xs(ORIG_KEY)
    out = metrics.copy()
    for m in metric_ids():
        if m == "relative_median_difference":
            out[m] = -(out[m].subtract(orig_raw[m], level=1)).abs()
        else:
            mult = -1.0 if METRICS[m].is_reduction else 1.0
            out[m] = out[m] * mult
    return out


def _per_band(series_by_band: pd.Series, index: pd.MultiIndex) -> pd.Series:
    """Broadcast a band-indexed series onto a (correction, band) index."""
    vals = index.get_level_values(1).map(series_by_band)
    return pd.Series(np.asarray(vals, dtype=float), index=index)


def normalize_vs_original(combined: pd.DataFrame,
                          orig_raw: pd.DataFrame) -> pd.DataFrame:
    """Split min-max normalization around the PRE-combine original value
    (reference quirk — see module docstring)."""
    norm = pd.DataFrame(index=combined.index, columns=metric_ids(), dtype=float)
    for m in metric_ids():
        col = combined[m]
        ov = _per_band(orig_raw[m], col.index)
        good = col > ov
        bad = col < ov
        max_good = _per_band(col.where(good).groupby(level=1).max(), col.index)
        min_bad = _per_band(col.where(bad).groupby(level=1).min(), col.index)
        n = pd.Series(np.nan, index=col.index)
        n[good] = ((col - ov) / (max_good - ov))[good]
        n[bad] = ((col - min_bad) / (ov - min_bad) - 1)[bad]
        n[col == ov] = 0.0
        norm[m] = n
    return norm.drop(ORIG_KEY, level=0)


def rank_corrections(tiles_ds, names: list[str] | None = None,
                     ctx: CorrectionContext = DEFAULT_CONTEXT,
                     weights: dict[str, float] | None = None,
                     band_combine: str = "sum"):
    """Full ranking. Returns (scores DataFrame sorted desc, metrics,
    normalized metrics)."""
    metrics = compute_metrics_table(tiles_ds, names, ctx)
    combined = combine_vs_original(metrics)
    normalized = normalize_vs_original(combined, metrics.xs(ORIG_KEY))
    from ..registry import METRICS

    w = np.array([(weights or {}).get(m, METRICS[m].weight)
                  for m in metric_ids()])
    per_band = (normalized * w).sum(axis=1)
    combiner = {
        "sum": lambda s: s.sum(), "mean": lambda s: s.mean(),
        "max": lambda s: s.max(), "min": lambda s: s.min(),
        "median": lambda s: s.median(),
    }[band_combine]
    scores = combiner(per_band.groupby(level=0)).to_frame(name="Score")
    scores = scores.sort_values("Score", ascending=False)
    return scores, metrics, normalized


def compute_metrics_table_zonal(tiles_ds, names: list[str] | None = None,
                                ctx: CorrectionContext = DEFAULT_CONTEXT) -> pd.DataFrame:
    """(correction, band, zone) x 7 metrics; requires ``zone_ids`` tiles."""
    from ..stages.metrics import evaluate_corrections_zonal_ds

    from ..registry import CORRECTIONS

    names = names or list(ok.CORRECTION_NAMES)
    fns = [(n, CORRECTIONS[n]) for n in names]   # driver-side resolve
    terrain = prepare_terrain(tiles_ds, ctx)
    coeffs = fit_corrections(terrain, ctx)
    wide = terrain.map_batches(
        lambda b: apply_all_wide_batch(b, fns, coeffs, ctx),
        batch_format="pyarrow")
    mt = evaluate_corrections_zonal_ds(wide, [_col(n) for n in names]).to_pandas()
    inv = {_col(n): n for n in names}
    mt["correction"] = mt["correction"].map(lambda c: inv.get(c, c))
    return mt.set_index(["correction", "band", "zone"]).sort_index()


def rank_corrections_zonal(tiles_ds, names: list[str] | None = None,
                           ctx: CorrectionContext = DEFAULT_CONTEXT,
                           weights: dict[str, float] | None = None,
                           band_combine: str = "sum") -> dict[int, pd.DataFrame]:
    """Per-zone ranking (reference evaluates each classification group
    independently, ``eval.py:143-151``). Returns {zone: scores}."""
    mt = compute_metrics_table_zonal(tiles_ds, names, ctx)
    out: dict[int, pd.DataFrame] = {}
    for zone in sorted(mt.index.get_level_values(2).unique()):
        sub = mt.xs(zone, level=2)
        combined = combine_vs_original(sub)
        normalized = normalize_vs_original(combined, sub.xs(ORIG_KEY))
        from ..registry import METRICS
        w = np.array([(weights or {}).get(m, METRICS[m].weight)
                      for m in metric_ids()])
        per_band = (normalized * w).sum(axis=1)
        combiner = {
            "sum": lambda s: s.sum(), "mean": lambda s: s.mean(),
            "max": lambda s: s.max(), "min": lambda s: s.min(),
            "median": lambda s: s.median(),
        }[band_combine]
        scores = combiner(per_band.groupby(level=0)).to_frame(name="Score")
        out[int(zone)] = scores.sort_values("Score", ascending=False)
    return out


def export_rank_report(scores: pd.DataFrame, metrics: pd.DataFrame,
                       normalized: pd.DataFrame, out_dir: str) -> list[str]:
    """Driver-side report sink (reference exports xlsx sheets,
    ``multi_criteria_eval.py:231-265``; engine writes CSV + parquet +
    a real xlsx workbook via the stdlib OOXML writer)."""
    import os

    from .report import write_xlsx

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    sheets = {}
    for name, df in (("scores", scores), ("metrics", metrics),
                     ("normalized_metrics", normalized)):
        p = os.path.join(out_dir, f"{name}.csv")
        df.to_csv(p)
        df.reset_index().to_parquet(os.path.join(out_dir, f"{name}.parquet"))
        sheets[name] = df.reset_index()
        paths.append(p)
    paths.append(write_xlsx(os.path.join(out_dir, "report.xlsx"), sheets))
    return paths
